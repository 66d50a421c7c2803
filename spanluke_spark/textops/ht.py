"""Horvitz-Thompson estimation under Poisson pips sampling (Horvitz
& Thompson 1952) — the estimator a 100 TB pipeline uses when it can
only afford to SCAN a size-biased sample: include each item with
probability proportional to a cheap size measure, then reweight by
1/pi to estimate the population total of an expensive measure
without bias. The design-based companion of priority sampling
(q294): priority sampling fixes the sample SIZE, Poisson pips fixes
the DESIGN and gives the textbook closed-form variance estimator.

Design, fully deterministic (no rand() anywhere, the repo-wide
discipline): pi_i = min(1, k * s_i / S) with S = sum s, and item i
is "drawn" iff u_i < pi_i for u_i = portable_hash64(id) mod 10^6 /
10^6 — the md5-derived hash both engines compute bit-identically, so
the sample membership itself is oracle-replayable. The inclusion
test is the EXACT integer cross-multiplication
u_ppm * S < 10^6 * k * s_i (never a float compare).

Estimators, once-quantized per item (the q334 cell discipline):

  t_cell_milli = 1000 * y_i * S div (k * s_i)     [pi < 1]
               = 1000 * y_i                        [pi >= 1]
  v_cell_milli = 1000 * (S - k*s_i) * y_i^2 * S div (k^2 * s_i^2)
               = 0                                 [pi >= 1]

  t_hat_milli  = sum of t_cells over the sample
  var_hat_milli= sum of v_cells  (Poisson-design Var estimator
                 sum (1-pi)(y/pi)^2, exact per-cell rational)

Certainty lane pytest-pinned: k large enough that every pi >= 1
draws the census and t_hat == 1000 * census EXACTLY with var == 0.
Long-bound contract: (S - k*s)*y^2*S needs S * max|y| <= ~10^6
(the q330 bounded-slice discipline; the fixture sizes obey it).

Distributed shape: one totals aggregate broadcast back, one filter
(the sample never shuffles), one final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import portable_hash64

__all__ = ["horvitz_thompson"]


def horvitz_thompson(
    df: DataFrame,
    k: int,
    id_col: str = "id",
    size_col: str = "s",
    y_col: str = "y",
) -> DataFrame:
    """(id, s size measure > 0, y value) -> ONE row (n_pop, k,
    s_total, census_milli, n_sample, t_hat_milli, var_hat_milli)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    base = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(size_col).cast("long").alias("s"),
        F.col(y_col).cast("long").alias("y"),
    )
    tot = base.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_pop"),
        F.sum("s").alias("s_total"),
        F.sum("y").alias("census"),
    )
    rows = base.crossJoin(F.broadcast(tot)).select(
        "*",
        F.pmod(portable_hash64(F.col("id")), F.lit(1_000_000)).alias(
            "u_ppm"
        ),
    )
    certain = F.lit(k) * F.col("s") >= F.col("s_total")
    drawn = certain | (
        F.col("u_ppm") * F.col("s_total")
        < F.lit(1_000_000 * k) * F.col("s")
    )
    cells = rows.where(drawn).select(
        "n_pop",
        "s_total",
        "census",
        F.when(certain, 1000 * F.col("y"))
        .otherwise(
            F.expr(f"1000 * y * s_total div ({k} * s)")
        )
        .alias("t_cell"),
        F.when(certain, F.lit(0).cast("long"))
        .otherwise(
            F.expr(
                f"1000 * (s_total - {k} * s) * y * y * s_total"
                f" div ({k} * {k} * s * s)"
            )
        )
        .alias("v_cell"),
    )
    agg = cells.groupBy().agg(
        F.max("n_pop").alias("n_pop"),
        F.max("s_total").alias("s_total"),
        F.max("census").alias("census"),
        F.count(F.lit(1)).cast("long").alias("n_sample"),
        F.sum("t_cell").alias("t_hat_milli"),
        F.sum("v_cell").alias("var_hat_milli"),
    )
    return agg.select(
        "n_pop",
        F.lit(k).cast("long").alias("k"),
        "s_total",
        (1000 * F.col("census")).alias("census_milli"),
        "n_sample",
        "t_hat_milli",
        "var_hat_milli",
    )
