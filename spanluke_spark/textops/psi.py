"""Population Stability Index (the credit-scoring / model-monitoring
standard; Karakoulas 2004 writeup of the industry rule) between a
reference and a current bucketed score distribution — THE deployed
drift dashboard number, with its conventional bands: < 0.10 stable,
0.10-0.25 moderate shift, > 0.25 significant shift. Completes the
drift family: KL (q275) and JSD (q334) are its information-theoretic
relatives, TVD/chi-square (q367) the log-free ones; PSI is what the
monitoring playbooks actually threshold.

PSI = sum_i (q_i - p_i) * ln(q_i / p_i)  over buckets, each term
>= 0. Exactness (the q334 once-quantized ln-ppm discipline): with
reference counts a_i (total Na) and current counts b_i (total Nb),

  cell = (b_i*Na - a_i*Nb) * round(ln((b_i*Na)/(a_i*Nb)) * 10^6)
  psi_ppm = sum(cell) div (Na * Nb)

— the share gap rides the exact integer cross product, the log is
quantized ONCE on the same integer-argument rational in both engines,
and the single final division lands in ppm (250_000 = the 0.25
band edge). Buckets empty on EITHER side are SKIPPED AND COUNTED
(n_undefined — the q347 convention; production floors vary, this one
is deterministic). Pinned by pytest: identical distributions give
exactly 0; PSI is symmetric (each term is); duplicating one whole
sample leaves psi_ppm EXACTLY unchanged (numerator and denominator
double); a planted shift crosses the 250_000 band.

Distributed shape: one bucket-count aggregate per side, one
full-outer bucket join, one 1-row totals broadcast, one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["psi"]


def psi(
    ref: DataFrame,
    cur: DataFrame,
    bucket_col: str = "bucket",
) -> DataFrame:
    """ref(bucket), cur(bucket) one row per observation -> ONE row
    (n_ref, n_cur, n_buckets, n_undefined, psi_ppm, band)."""
    a = ref.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("a")
    )
    b = cur.groupBy(F.col(bucket_col).alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("b")
    )
    grid = a.join(b, "bucket", "full").select(
        F.coalesce(F.col("a"), F.lit(0).cast("long")).alias("a"),
        F.coalesce(F.col("b"), F.lit(0).cast("long")).alias("b"),
    )
    tot = grid.groupBy().agg(
        F.sum("a").alias("na"), F.sum("b").alias("nb")
    )
    ok = (F.col("a") > 0) & (F.col("b") > 0)
    gap = F.col("b") * F.col("na") - F.col("a") * F.col("nb")
    lnq = F.round(
        F.log(
            (F.col("b") * F.col("na")) / (F.col("a") * F.col("nb"))
        )
        * 1_000_000
    ).cast("long")
    cells = grid.crossJoin(F.broadcast(tot)).select(
        "na",
        "nb",
        F.when(ok, gap * lnq).otherwise(F.lit(0).cast("long")).alias(
            "cell"
        ),
        (~ok).cast("long").alias("undef"),
    )
    agg = cells.groupBy().agg(
        F.max("na").alias("n_ref"),
        F.max("nb").alias("n_cur"),
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("undef").alias("n_undefined"),
        F.sum("cell").alias("cell_sum"),
    )
    p = F.when(
        (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
        F.expr("cell_sum div (n_ref * n_cur)"),
    )
    x = agg.select(
        "n_ref", "n_cur", "n_buckets", "n_undefined", p.alias("psi_ppm")
    )
    return x.select(
        "*",
        F.when(F.col("psi_ppm").isNull(), F.lit(None).cast("string"))
        .when(F.col("psi_ppm") < 100_000, F.lit("stable"))
        .when(F.col("psi_ppm") < 250_000, F.lit("moderate_shift"))
        .otherwise(F.lit("significant_shift"))
        .alias("band"),
    )
