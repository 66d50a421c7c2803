"""Spearman's rank correlation with ties (Spearman 1904; tie-aware
Pearson-on-ranks form) — the monotone-association companion to
Mann-Kendall's trend test (q295) and RBO's top-weighted overlap
(q304): does one quality signal rank documents like another, without
assuming linearity?

Exactness discipline (the q295 sqrt-free shape): fractional average
ranks are carried as integer DOUBLE-ranks dr = 2*avg_rank =
min_rank + max_rank = 2*rank() + cnt - 1, so ties never leave the
integers. With a = dr_x, b = dr_y over n rows,

  num  = n*sum(ab) - sum(a)*sum(b)        (sign of rho, exact)
  den2x = n*sum(a^2) - sum(a)^2           (= 4/3 * n^2(n^2-1)/4 max)
  den2y = n*sum(b^2) - sum(b)^2

rho^2 is reported ppm-quantized WITHOUT any sqrt via the two-stage
trunc (q308 discipline, each stage sized to the long bound because
num^2 <= den2x*den2y):

  rho2_ppm = ((num*num div den2x) * 10^6) div den2y

Overflow: num^2 <= den2x*den2y ~ n^8/9, safe to n ~ 260; callers
bound the fixture. Constant columns (den2 = 0) surface NULL.

Distributed shape: two global rank windows over a bounded evaluation
slice (a correlation is inherently a total order; at scale Spark
range-partitions the sort), then ONE tiny aggregate — no joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spearman_rho"]


def spearman_rho(
    pairs: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """(x, y) numeric -> ONE row (n, num, den2x, den2y, rho2_ppm,
    rho_sign): exact integer Pearson-on-double-ranks carry plus the
    two-stage trunc-ppm rho^2 and the exact sign."""

    def dr(col: str, alias: str):
        w = Window.orderBy(col)
        c = Window.partitionBy(col)
        return (
            2 * F.rank().over(w) + F.count(F.lit(1)).over(c) - 1
        ).cast("long").alias(alias)

    ranked = pairs.select(dr(x_col, "a"), dr(y_col, "b"))
    s = ranked.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("a").alias("sa"),
        F.sum("b").alias("sb"),
        F.sum(F.col("a") * F.col("b")).alias("sab"),
        F.sum(F.col("a") * F.col("a")).alias("saa"),
        F.sum(F.col("b") * F.col("b")).alias("sbb"),
    )
    num = F.col("n") * F.col("sab") - F.col("sa") * F.col("sb")
    d2x = F.col("n") * F.col("saa") - F.col("sa") * F.col("sa")
    d2y = F.col("n") * F.col("sbb") - F.col("sb") * F.col("sb")
    out = s.select(
        "n",
        num.alias("num"),
        d2x.alias("den2x"),
        d2y.alias("den2y"),
    )
    return out.select(
        "n",
        "num",
        "den2x",
        "den2y",
        F.when(
            (F.col("den2x") > 0) & (F.col("den2y") > 0),
            F.expr("((num * num) div den2x * 1000000) div den2y"),
        ).alias("rho2_ppm"),
        F.when(F.col("num") > 0, F.lit(1))
        .when(F.col("num") < 0, F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("rho_sign"),
    )
