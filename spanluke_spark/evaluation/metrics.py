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


def _pairings(gold: DataFrame, pred: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """The two-stage nervaluate pairing shared by overall and per-tag metrics.

    Stage 1: exact-boundary pairing (unique per side by non-overlap).
    Stage 2: overlap pairing among the leftovers, deterministic greedy —
    each pred takes the first overlapping gold by (start, end); each gold
    keeps the first pred by (start, end).
    Returns (g, p, exact, paired); exact/paired carry g_label and p_label.
    """
    g = _prep(gold, "g")
    p = _prep(pred, "p")
    exact = g.join(
        p,
        (F.col("g_doc") == F.col("p_doc"))
        & (F.col("g_start") == F.col("p_start"))
        & (F.col("g_end") == F.col("p_end")),
    ).select("g_doc", "g_start", "g_end", "g_label", "p_label")

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
    return g, p, exact, paired


def _tag_counts(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Per-label pairing counts, one lazy plan:
    (label, n_gold, n_pred, n_exact, n_exact_type, n_par, n_par_type,
     n_pred_matched). All regime vectors derive from these by arithmetic."""
    g, p, exact, paired = _pairings(gold, pred)
    typed = F.count(F.when(F.col("g_label") == F.col("p_label"), 1))
    by_gold_exact = exact.groupBy(F.col("g_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_exact"), typed.alias("n_exact_type")
    )
    by_gold_par = paired.groupBy(F.col("g_label").alias("label")).agg(
        F.count(F.lit(1)).alias("n_par"), typed.alias("n_par_type")
    )
    n_gold = g.groupBy(F.col("g_label").alias("label")).agg(F.count(F.lit(1)).alias("n_gold"))
    n_pred = p.groupBy(F.col("p_label").alias("label")).agg(F.count(F.lit(1)).alias("n_pred"))
    matched_pred = (
        exact.select(F.col("p_label").alias("label"))
        .unionByName(paired.select(F.col("p_label").alias("label")))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_pred_matched"))
    )
    out = (
        n_gold.join(n_pred, "label", "full_outer")
        .join(by_gold_exact, "label", "full_outer")
        .join(by_gold_par, "label", "full_outer")
        .join(matched_pred, "label", "full_outer")
    )
    zero = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)  # noqa: E731
    return out.select(
        "label",
        *[
            zero(c)
            for c in [
                "n_gold",
                "n_pred",
                "n_exact",
                "n_exact_type",
                "n_par",
                "n_par_type",
                "n_pred_matched",
            ]
        ],
    )


def _regime_rows(counts: DataFrame, extra_cols: list[str]) -> DataFrame:
    """Expand pairing counts into the 4 nervaluate regimes with P/R/F1
    expressions (lazy; formulas per module docstring / main.py:326-342)."""
    ex, ext, pa, pat = (
        F.col("n_exact"),
        F.col("n_exact_type"),
        F.col("n_par"),
        F.col("n_par_type"),
    )
    mis = (F.col("n_gold") - ex - pa).alias("mis")
    spu = (F.col("n_pred") - F.col("n_pred_matched")).alias("spu")
    regimes = {
        "strict": (ext, (ex - ext) + pa, F.lit(0).cast("long")),
        "exact": (ex, pa, F.lit(0).cast("long")),
        "partial": (ex, F.lit(0).cast("long"), pa),
        "ent_type": (ext + pat, (ex - ext) + (pa - pat), F.lit(0).cast("long")),
    }
    parts = []
    for regime, (cor, inc, par) in regimes.items():
        base = counts.select(
            *extra_cols,
            F.lit(regime).alias("regime"),
            cor.alias("cor"),
            inc.alias("inc"),
            par.alias("par"),
            mis,
            spu,
        )
        act = F.col("cor") + F.col("inc") + F.col("par") + F.col("spu")
        pos = F.col("cor") + F.col("inc") + F.col("par") + F.col("mis")
        num = F.col("cor") + 0.5 * F.col("par")
        prec = F.when(act == 0, F.lit(0.0)).otherwise(num / act)
        rec = F.when(pos == 0, F.lit(0.0)).otherwise(num / pos)
        parts.append(
            base.select(
                "*",
                prec.alias("precision"),
                rec.alias("recall"),
                (2 * prec * rec / (prec + rec + F.lit(1e-9))).alias("f1"),
            )
        )
    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    return out


def nervaluate_counts(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """COR/INC/PAR/MIS/SPU per regime (strict/exact/partial/ent_type) as one
    lazy DataFrame — (regime, cor, inc, par, mis, spu, precision, recall, f1).
    Zero driver-side actions (the previous version fired six count() jobs
    recomputing the pairing pipeline; now one aggregate over _tag_counts)."""
    overall = _tag_counts(gold, pred).agg(
        *[
            F.sum(c).alias(c)
            for c in [
                "n_gold",
                "n_pred",
                "n_exact",
                "n_exact_type",
                "n_par",
                "n_par_type",
                "n_pred_matched",
            ]
        ]
    )
    return _regime_rows(overall, [])


def nervaluate_per_tag(gold: DataFrame, pred: DataFrame) -> DataFrame:
    """Per-entity-type nervaluate breakdown — the reference's
    ``results_per_tag`` (legal_ner/main.py:317-342, consumed at 429-443;
    tuning.py:282-307): (label, regime, cor, inc, par, mis, spu, precision,
    recall, f1), one row per (label, regime).

    Attribution convention: COR/INC/PAR/MIS are charged to the GOLD label;
    SPU (unmatched predictions) to the PREDICTED label. (nervaluate's
    historical SemEval script charges each spurious against every tag; the
    gold/pred-label convention here is the one actually used for per-type
    model grading and keeps per-tag counts summing to the overall counts.)
    """
    return _regime_rows(_tag_counts(gold, pred), ["label"])


def token_accuracy(
    gold_tokens: DataFrame, pred_tokens: DataFrame, keys: list[str] = ("doc", "pos")
) -> DataFrame:
    """Seqeval-style token-level overall accuracy (legal_ner/main.py:296-302):
    fraction of token positions whose predicted label equals gold. Lazy
    single-row DataFrame (n_tokens, n_correct, accuracy)."""
    keys = list(keys)
    g = gold_tokens.select(*keys, F.col("label").alias("_g_label"))
    p = pred_tokens.select(*keys, F.col("label").alias("_p_label"))
    return (
        g.join(p, keys, "inner")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count(F.when(F.col("_g_label") == F.col("_p_label"), 1)).alias("n_correct"),
        )
        .select(
            "n_tokens",
            "n_correct",
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(F.col("n_correct").cast("double") / F.col("n_tokens"))
            .alias("accuracy"),
        )
    )
