"""Mann-Whitney U (Wilcoxon rank-sum) — the nonparametric two-sample
test for curation A/B decisions: did the new filter policy shift the
quality-score / length / LM-score distribution, without assuming
normality? Complements the parametric z-scores of etl/bursts.py and the
resampled CIs of textops/bootstrap.py.

Relational shape (the q102 Zipf discipline): ranks are never assigned
per row — the corpus collapses to VALUE CLASSES (one aggregate,
map-side combinable), and midranks come from a running sum over that
bounded class relation (quality metrics are discretized in practice;
the only unkeyed window sees |distinct values| rows, not |corpus|).
Rank sums are carried as EXACT integers (2 x midrank = 2·cum_lt + c + 1
is always integral), so the statistic is bit-identical in the DuckDB
oracle regardless of aggregation order; the only floats are the final
closed-form mean/variance/z expressions over those exact integers,
including the tie-corrected variance
sigma^2 = (n1 n2 / 12) ((n+1) - sum(t^3 - t) / (n (n-1))).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mann_whitney_u"]


def mann_whitney_u(
    df: DataFrame,
    is_treatment: Column,
    value: Column,
) -> DataFrame:
    """-> one row (n1, n2, u1, u2, z, rank_biserial): U statistic of the
    treatment group, normal-approximation z with tie correction (NULL
    when a group is empty or the variance degenerates), rank-biserial
    effect size r = 2 U1 / (n1 n2) - 1."""
    vals = df.select(
        value.cast("double").alias("v"),
        is_treatment.cast("int").alias("g"),
    )
    classes = vals.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("g").alias("n1v")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    cum = classes.withColumn(
        "cum_lt", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    agg = cum.agg(
        F.sum("n1v").alias("n1"),
        F.sum(F.col("c") - F.col("n1v")).alias("n2"),
        F.sum(
            F.col("n1v") * (2 * F.col("cum_lt") + F.col("c") + 1)
        ).alias("r1x2"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c")).alias("ties"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1 = (F.col("r1x2") - n1 * (n1 + 1)) / 2.0
    mu = n1 * n2 / 2.0
    sigma2 = (
        (n1 * n2 / 12.0)
        * ((n + 1) - F.col("ties") / (n * (n - 1)))
    )
    z = F.when(
        (n1 > 0) & (n2 > 0) & (sigma2 > 0), (u1 - mu) / F.sqrt(sigma2)
    )
    rb = F.when((n1 > 0) & (n2 > 0), 2.0 * u1 / (n1 * n2) - 1.0)
    return agg.select(
        "n1",
        "n2",
        F.round(u1, 6).alias("u1"),
        F.round(n1 * n2 - u1, 6).alias("u2"),
        F.round(z, 6).alias("z"),
        F.round(rb, 6).alias("rank_biserial"),
    )
