"""A1/A2/U3: nervaluate-style span metrics as DataFrame operations.

The reference evaluates with nervaluate's four regimes (legal_ner/main.py:
317-342, 417-443): strict (boundary+type), exact (boundary), partial (overlap
= 0.5 credit), ent_type (overlap+type). Formulas (nervaluate):

    precision = (COR + 0.5*PAR) / (COR + INC + PAR + SPU)
    recall    = (COR + 0.5*PAR) / (COR + INC + PAR + MIS)
    f1        = 2*p*r / (p + r + 1e-9)     # epsilon per main.py:326-342

Spans within one side are assumed non-overlapping (true for both reference
decodes and ours); overlap pairing ties break deterministically by
(gold.start, gold.end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KEY = ["doc", "start", "end"]


def _prep(df: DataFrame, side: str) -> DataFrame:
    return df.select(
        F.col("doc").alias(f"{side}_doc"),
        F.col("start").alias(f"{side}_start"),
        F.col("end").alias(f"{side}_end"),
        F.col("label").alias(f"{side}_label"),
    )


def strict_prf(gold: DataFrame, pred: DataFrame) -> dict:
    """Strict P/R/F1: exact (doc, start, end, label) matches — the
    BASELINE.json ≥0.95 gate. Single full-outer join, one action."""
    g = gold.select("doc", "start", "end", "label").distinct().withColumn("_g", F.lit(1))
    p = pred.select("doc", "start", "end", "label").distinct().withColumn("_p", F.lit(1))
    row = (
        g.join(p, ["doc", "start", "end", "label"], "full_outer")
        .agg(
            F.count(F.when(F.col("_g").isNotNull() & F.col("_p").isNotNull(), 1)).alias("tp"),
            F.count(F.when(F.col("_g").isNotNull() & F.col("_p").isNull(), 1)).alias("fn"),
            F.count(F.when(F.col("_g").isNull() & F.col("_p").isNotNull(), 1)).alias("fp"),
        )
        .first()
    )
    tp, fn, fp = row.tp, row.fn, row.fp
    prec = tp / (tp + fp) if tp + fp else 0.0
    rec = tp / (tp + fn) if tp + fn else 0.0
    return {
        "tp": tp,
        "fn": fn,
        "fp": fp,
        "precision": prec,
        "recall": rec,
        "f1": 2 * prec * rec / (prec + rec + 1e-9),
    }


def nervaluate_counts(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """COR/INC/PAR/MIS/SPU per regime (strict/exact/partial/ent_type) as one
    DataFrame — (regime, cor, inc, par, mis, spu, precision, recall, f1)."""
    g = _prep(gold, "g")
    p = _prep(pred, "p")

    # Stage 1: exact-boundary pairing (unique per side by non-overlap).
    exact = g.join(
        p,
        (F.col("g_doc") == F.col("p_doc"))
        & (F.col("g_start") == F.col("p_start"))
        & (F.col("g_end") == F.col("p_end")),
    ).select("g_doc", "g_start", "g_end", "g_label", "p_label")

    # Stage 2: overlap pairing among the leftovers, deterministic greedy:
    # each pred takes the first overlapping gold by (start, end); each gold
    # keeps the first pred by (start, end).
    g_left = g.join(
        exact.select(
            F.col("g_doc").alias("doc"), F.col("g_start").alias("s"), F.col("g_end").alias("e")
        ),
        (F.col("g_doc") == F.col("doc")) & (F.col("g_start") == F.col("s")) & (F.col("g_end") == F.col("e")),
        "left_anti",
    )
    p_left = p.join(
        exact.select(
            F.col("g_doc").alias("doc"), F.col("g_start").alias("s"), F.col("g_end").alias("e")
        ),
        (F.col("p_doc") == F.col("doc")) & (F.col("p_start") == F.col("s")) & (F.col("p_end") == F.col("e")),
        "left_anti",
    )
    ov = g_left.join(
        p_left,
        (F.col("g_doc") == F.col("p_doc"))
        & (F.col("g_start") < F.col("p_end"))
        & (F.col("g_end") > F.col("p_start")),
    )
    w_pred = Window.partitionBy("p_doc", "p_start", "p_end").orderBy("g_start", "g_end")
    w_gold = Window.partitionBy("g_doc", "g_start", "g_end").orderBy("p_start", "p_end")
    paired = (
        ov.withColumn("_rp", F.row_number().over(w_pred))
        .filter(F.col("_rp") == 1)
        .withColumn("_rg", F.row_number().over(w_gold))
        .filter(F.col("_rg") == 1)
    )

    n_gold = g.count()
    n_pred = p.count()
    exact_match = exact.count()
    exact_type = exact.filter(F.col("g_label") == F.col("p_label")).count()
    par_match = paired.count()
    par_type = paired.filter(F.col("g_label") == F.col("p_label")).count()

    # Regime count vectors (nervaluate semantics):
    rows = []
    # strict: COR = boundary+type; INC = boundary pairing w/ wrong type AND
    # overlap pairings; MIS/SPU = unmatched
    for regime, cor, inc, par in [
        ("strict", exact_type, (exact_match - exact_type) + par_match, 0),
        ("exact", exact_match, par_match, 0),
        ("partial", exact_match, 0, par_match),
        ("ent_type", exact_type + par_type, (exact_match - exact_type) + (par_match - par_type), 0),
    ]:
        mis = n_gold - exact_match - par_match
        spu = n_pred - exact_match - par_match
        act = cor + inc + par + spu
        pos = cor + inc + par + mis
        prec = (cor + 0.5 * par) / act if act else 0.0
        rec = (cor + 0.5 * par) / pos if pos else 0.0
        f1 = 2 * prec * rec / (prec + rec + 1e-9)
        rows.append((regime, cor, inc, par, mis, spu, prec, rec, f1))

    spark = gold.sparkSession
    return spark.createDataFrame(
        rows,
        "regime string, cor long, inc long, par long, mis long, spu long, "
        "precision double, recall double, f1 double",
    )
