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

__all__ = ["mann_whitney_u", "kendall_tau_b", "ks_two_sample"]


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


def kendall_tau_b(
    df: DataFrame,
    x: Column,
    y: Column,
) -> DataFrame:
    """-> one row (n, concordant, discordant, tau_b): Kendall's rank
    correlation with the tie-corrected tau-b denominator — do two
    ranking signals (PageRank vs citation authority, quality score vs
    LM score) order the corpus the same way?

        tau_b = (C - D) / sqrt((n0 - n1)(n0 - n2))
        n0 = n(n-1)/2,  n1 = sum_x t(t-1)/2,  n2 = sum_y t(t-1)/2

    Relational shape (the mann_whitney_u value-class discipline): rows
    collapse to (x, y) VALUE CLASSES first — one map-side-combinable
    aggregate — and the pair enumeration is the class-pair self-join, so
    the quadratic term is in the number of DISTINCT value pairs, never
    the corpus size. Contract, stated: signals must be discretized
    (quantize continuous scores upstream); the class count is the
    caller's scale knob, exactly dedup's brute-lane contract. Every
    count (C, D, tie terms) is an exact integer product-sum — the only
    float is the final closed form — so the DuckDB oracle replays the
    statistic bit-exactly (q266).
    """
    classes = (
        df.select(x.cast("long").alias("x"), y.cast("long").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    a, b = classes.alias("a"), classes.alias("b")
    ax, ay, ac = F.col("a.x"), F.col("a.y"), F.col("a.c")
    bx, by, bc = F.col("b.x"), F.col("b.y"), F.col("b.c")
    pairs = a.join(
        b, (ax < bx) | ((ax == bx) & (ay < by)), "inner"
    ).select(
        (ac * bc).alias("cc"),
        F.signum(((ax - bx) * (ay - by)).cast("double")).cast("int").alias("sgn"),
    )
    cross = pairs.agg(
        F.coalesce(F.sum(F.when(F.col("sgn") == 1, F.col("cc"))), F.lit(0)).alias(
            "concordant"
        ),
        F.coalesce(F.sum(F.when(F.col("sgn") == -1, F.col("cc"))), F.lit(0)).alias(
            "discordant"
        ),
    )
    margx = (
        classes.groupBy("x")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n1"))
    )
    margy = (
        classes.groupBy("y")
        .agg(F.sum("c").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).alias("n2"))
    )
    tot = classes.agg(F.sum("c").alias("n"))
    row = (
        cross.crossJoin(F.broadcast(margx))
        .crossJoin(F.broadcast(margy))
        .crossJoin(F.broadcast(tot))
    )
    n0 = F.col("n") * (F.col("n") - 1) / 2
    denom = F.sqrt((n0 - F.col("n1")) * (n0 - F.col("n2")))
    tau = F.when(
        denom > 0,
        (F.col("concordant") - F.col("discordant")) / denom,
    )
    return row.select(
        "n",
        "concordant",
        "discordant",
        F.round(tau, 6).alias("tau_b"),
    )


def ks_two_sample(
    df: DataFrame,
    is_treatment: Column,
    value: Column,
) -> DataFrame:
    """-> one row (n1, n2, d_num, d, ks_stat): the two-sample
    Kolmogorov-Smirnov distance D = max_x |F1(x) - F2(x)| between the
    treatment and control empirical CDFs, plus the scaled statistic
    sqrt(n1 n2 / (n1 + n2)) * D. The distribution-shape complement of
    mann_whitney_u (which sees only location): a filter policy that
    narrows the length distribution without moving its median shows up
    here first.

    Relational shape: one value-class aggregate (map-side combinable),
    one running sum over the bounded class relation, one max — D is
    carried as the EXACT integer d_num = max|cum1*n2 - cum2*n1| over
    exact cumulative counts (cross-multiplied to avoid rational CDFs),
    so the statistic replays bit-exactly in the DuckDB oracle (q267);
    the only floats are the final two divisions. NULL statistic when a
    group is empty.
    """
    vals = df.select(
        value.cast("long").alias("v"),
        is_treatment.cast("int").alias("g"),
    )
    classes = vals.groupBy("v").agg(
        F.sum("g").alias("c1"),
        F.sum(1 - F.col("g")).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = classes.select(
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    tot = classes.agg(
        F.sum("c1").alias("n1"), F.sum("c2").alias("n2")
    )
    agg = cum.crossJoin(F.broadcast(tot)).agg(
        F.first("n1").alias("n1"),
        F.first("n2").alias("n2"),
        F.max(
            F.abs(F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1"))
        ).alias("d_num"),
    )
    ok = (F.col("n1") > 0) & (F.col("n2") > 0)
    d = F.when(ok, F.col("d_num") / (F.col("n1") * F.col("n2")))
    ks = F.when(
        ok,
        F.sqrt(
            F.col("n1").cast("double")
            * F.col("n2")
            / (F.col("n1") + F.col("n2"))
        )
        * F.col("d_num")
        / (F.col("n1") * F.col("n2")),
    )
    return agg.select(
        "n1",
        "n2",
        "d_num",
        F.round(d, 6).alias("d"),
        F.round(ks, 6).alias("ks_stat"),
    )
