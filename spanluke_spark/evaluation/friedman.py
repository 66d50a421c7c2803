"""Friedman test + Kendall's W (Friedman 1937; Kendall & Babington
Smith 1939) — the BLOCKED k-treatment rank test completing the
nonparametric family: Kruskal-Wallis (q337) compares independent
groups, Friedman compares k systems rated on the SAME n blocks
(queries, raters, hosts), exactly the repeated-measures design of a
ranker shoot-out; Kendall's W = chi2/(n(k-1)) re-expresses it as the
[0, 1] concordance of the n block-rankings.

Exactness discipline: within-block fractional average ranks carried
as integer DOUBLE-ranks (q330), so per-treatment rank sums DRj are
exact, and because the 12/4 = 3 folds into the constant, the no-tie
statistic is ONE truncating division:

  chi2_ppm = 3 * sum_j DRj^2 * 10^6 div (n*k*(k+1)) - 3*n*(k+1)*10^6

The within-block tie correction divides by C = 1 - sum(t^3 - t) /
(n*(k^3 - k)) and is applied by exact cross-multiplication
(sign-split, since quantization can push chi2_ppm ppm-units below
zero); all-tied blocks (C = 0) surface NULL. Kendall's W is the
staged trunc w_ppm = chi2c_ppm div (n*(k-1)). Incomplete blocks
(fewer or more than k rows) are DROPPED and counted — the statistic
is only defined on complete blocks, the Fleiss lane's contract.
Significance is the integer gate chi2c_ppm >= crit_ppm against a
caller-supplied published chi-squared df=k-1 critical value.

Distributed shape: one within-block rank window (partitioned — this
one scales without a global sort), one (treatment) groupBy, one tie
groupBy, 1-row broadcasts only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["friedman"]


def friedman(
    samples: DataFrame,
    k: int,
    crit_ppm: int,
    block_col: str = "block",
    trt_col: str = "trt",
    value_col: str = "value",
) -> DataFrame:
    """(block, trt, value) -> ONE row (n_blocks, k, n_dropped,
    sum_drj2, chi2_ppm, tie_cube, chi2c_ppm, w_ppm, sig)."""
    t = samples.select(
        F.col(block_col).alias("block"),
        F.col(trt_col).alias("trt"),
        F.col(value_col).alias("value"),
    )
    sizes = t.groupBy("block").agg(
        F.count(F.lit(1)).cast("long").alias("bn")
    )
    keep = sizes.where(F.col("bn") == k).select("block")
    drop = sizes.where(F.col("bn") != k).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_dropped")
    )
    kept = t.join(F.broadcast(keep), "block")
    w = Window.partitionBy("block").orderBy("value")
    c = Window.partitionBy("block", "value")
    ranked = kept.select(
        "block",
        "trt",
        "value",
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(c) - 1)
        .cast("long")
        .alias("dr"),
    )
    per = ranked.groupBy("trt").agg(F.sum("dr").alias("drj"))
    s = per.groupBy().agg(
        F.sum(F.col("drj") * F.col("drj")).alias("sum_drj2")
    )
    nrow = keep.groupBy().agg(F.count(F.lit(1)).cast("long").alias("n"))
    ties = (
        ranked.groupBy("block", "value")
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .groupBy()
        .agg(
            F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
            .alias("tie_cube")
        )
    )
    kk = F.lit(k).cast("long")
    x = (
        s.crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(drop))
        .select(
            F.col("n").alias("n_blocks"),
            kk.alias("k"),
            F.coalesce(F.col("n_dropped"), F.lit(0).cast("long")).alias(
                "n_dropped"
            ),
            "sum_drj2",
            "tie_cube",
            (
                F.expr(f"3 * sum_drj2 * 1000000 div (n * {k} * {k + 1})")
                - 3 * F.col("n") * (k + 1) * F.lit(1_000_000)
            ).alias("chi2_ppm"),
        )
    )
    denom = F.expr(f"n_blocks * {k**3 - k} - tie_cube")
    mag = F.expr(
        f"abs(chi2_ppm) * (n_blocks * {k**3 - k})"
        f" div (n_blocks * {k**3 - k} - tie_cube)"
    )
    x2 = x.select(
        "*",
        F.when(
            denom > 0,
            F.when(F.col("chi2_ppm") < 0, -mag).otherwise(mag),
        ).alias("chi2c_ppm"),
    )
    wmag = F.expr(f"abs(chi2c_ppm) div (n_blocks * {k - 1})")
    return x2.select(
        "*",
        F.when(F.col("chi2c_ppm") < 0, -wmag).otherwise(wmag).alias("w_ppm"),
        (F.col("chi2c_ppm") >= F.lit(crit_ppm)).alias("sig"),
    )
