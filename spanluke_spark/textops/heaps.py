"""Heaps' law fit (Heaps 1978; Herdan 1960) — vocabulary growth
V(n) = K * n^beta over a corpus prefix, the companion corpus-statistic
to the Zipf spectrum fit (q102): a crawl slice whose beta drifts up is
getting noisier (OCR junk, spam word salad mint unbounded vocabulary),
one drifting down is saturating/duplicated. beta is the audit number.

Exact pipeline, no floats until the final ppm:
  1. first-occurrence doc per (group, word): ONE groupBy min — the
     cumulative vocabulary at doc t is |{w : first(w) <= t}|, so the
     whole growth curve costs one pass, not one count per prefix.
  2. per-doc new-word and token counts -> cumulative (V_t, N_t) by a
     running-sum window over the doc order.
  3. ~n_points SF-invariant checkpoints (every ceil(n/n_points)-th doc
     by rank) -> (x, y) = (round(ln N_t * 10^4), round(ln V_t * 10^4))
     quantized ONCE. 10^4 (not ppm) keeps the OLS products in a long:
     the checkpoint log-range is ~ln(n_points) =~ 3, so deviations are
     ~3*10^4 and n*Sxy - Sx*Sy stays ~10^11 even at 10^12 tokens —
     *10^6 for the final ppm is then ~1000x under the 2^63 bound
     (ppm-quantized inputs overflowed exactly there; caught by the
     replay test during build).
  4. log-log OLS slope as the exact integer rational
       beta_num = n*Sxy - Sx*Sy,   beta_den = n*Sxx - Sx^2
     (the q265 exact-Gram pattern), beta_ppm = sign-split trunc, and
     ln K recovered from the TRUNCATED slope so both engines replay
     bit-identically:
       lnk_ppm = (Sy*10^8 - beta_ppm*Sx*100) div (n*10^6).

Distributed shape: one explode+groupBy for first occurrences, one
groupBy per doc, windows keyed by group, a checkpoint filter, one
final agg per group. Groups (languages, domains) scale out; nothing
is quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["heaps_fit"]


def heaps_fit(
    docs: DataFrame,
    group_col: str = "grp",
    id_col: str = "id",
    text_col: str = "text",
    n_points: int = 20,
) -> DataFrame:
    """(group, doc id, text) -> per group: (grp, n_points, n_docs,
    n_tokens, vocab, beta_num, beta_den, beta_ppm, lnk_ppm). Doc order
    is id ascending; ids must be unique per group."""
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("d"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("w"),
    )
    first = toks.groupBy("grp", "w").agg(F.min("d").alias("fd"))
    new_per_doc = first.groupBy("grp", F.col("fd").alias("d")).agg(
        F.count(F.lit(1)).alias("nw")
    )
    tok_per_doc = toks.groupBy("grp", "d").agg(
        F.count(F.lit(1)).alias("nt")
    )
    per_doc = tok_per_doc.join(new_per_doc, ["grp", "d"], "left").select(
        "grp", "d", "nt", F.coalesce("nw", F.lit(0)).alias("nw")
    )
    wo = Window.partitionBy("grp").orderBy("d")
    cum = (
        per_doc.withColumn("rn", F.row_number().over(wo))
        .withColumn(
            "cum_n",
            F.sum("nt").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "cum_v",
            F.sum("nw").over(wo.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    nd = cum.groupBy("grp").agg(F.max("rn").alias("n_docs"))
    pts = (
        cum.join(nd, "grp")
        .withColumn(
            "step", F.expr(f"cast((n_docs + {n_points} - 1) div {n_points} as int)")
        )
        .where((F.col("rn") % F.col("step") == 0) & (F.col("cum_v") > 0))
        .select(
            "grp",
            "n_docs",
            F.round(F.log(F.col("cum_n").cast("double")) * 10_000)
            .cast("long")
            .alias("x"),
            F.round(F.log(F.col("cum_v").cast("double")) * 10_000)
            .cast("long")
            .alias("y"),
        )
    )
    fit = pts.groupBy("grp", "n_docs").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    totals = docs.select(
        F.col(group_col).alias("grp"), F.col(id_col).alias("d"), F.col(text_col).alias("t")
    )
    tot = (
        totals.select(
            "grp",
            F.size(F.filter(F.split("t", " "), lambda x: x != "")).alias(
                "z"
            ),
        )
        .groupBy("grp")
        .agg(F.sum("z").cast("long").alias("n_tokens"))
    )
    voc = first.groupBy("grp").agg(F.count(F.lit(1)).alias("vocab"))
    out = (
        fit.join(tot, "grp")
        .join(voc, "grp")
        .withColumn(
            "beta_num",
            (
                F.col("n_points") * F.col("sxy") - F.col("sx") * F.col("sy")
            ).cast("long"),
        )
        .withColumn(
            "beta_den",
            (
                F.col("n_points") * F.col("sxx") - F.col("sx") * F.col("sx")
            ).cast("long"),
        )
    )
    mag = F.expr("abs(beta_num) * 1000000 div beta_den")
    out = out.withColumn(
        "beta_ppm",
        F.when(F.col("beta_den") <= 0, F.lit(None).cast("long")).otherwise(
            F.when(F.col("beta_num") < 0, -mag).otherwise(mag)
        ),
    )
    lnk_mag = F.expr(
        "abs(sy * 100000000 - beta_ppm * sx * 100)"
        " div (n_points * 1000000)"
    )
    return out.withColumn(
        "lnk_ppm",
        F.when(F.col("beta_ppm").isNull(), F.lit(None).cast("long"))
        .otherwise(
            F.when(
                F.col("sy") * 100_000_000
                - F.col("beta_ppm") * F.col("sx") * 100
                < 0,
                -lnk_mag,
            ).otherwise(lnk_mag)
        ),
    ).select(
        "grp",
        "n_points",
        "n_docs",
        "n_tokens",
        "vocab",
        "beta_num",
        "beta_den",
        "beta_ppm",
        "lnk_ppm",
    )
