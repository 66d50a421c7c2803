"""Exact small-sample inference: the full-enumeration permutation
test for a two-group mean difference (Fisher 1935) and the
distribution-free order-statistic confidence interval for the
median (Thompson 1936) — the GOLD-STANDARD answers when a slice is
small enough to enumerate: no asymptotics, no quantized tail
approximations, the p-value IS a ratio of integer counts.

Permutation test: enumerate EVERY assignment of the n pooled values
into groups of sizes (m, n-m) relationally — a range(2^n) bitmask
table filtered to popcount == m (the q299 coalition-enumeration
discipline; n <= 16 is the stated regime, 65536 rows x n bits of
bounded work, NULL beyond). With fixed group sizes the mean
difference comparison clears to ONE integer per assignment:

  T(sub) = | n * S_sub - m * S_total |     (proportional to the
            absolute mean difference; denominators constant)
  p = #{assignments : T >= T_observed} / C(n, m)

reported as the exact pair (p_num, p_den) plus p_ppm; the observed
assignment always counts itself, so p >= 1/C(n,m) > 0 (pinned).
Two-sided by construction. Group-0-vs-group-1 relabelling leaves p
EXACTLY unchanged (|.| symmetry, pinned); a maximal separation
(all top values in one group) gives the minimal p = (#ties of the
extreme T) / C(n, m).

Median CI at the 95% level: the interval (x_(l+1), x_(n-l)) covers
the median with exact confidence 1 - 2 * P[Bin(n, 1/2) <= l]; the
largest l with cumulative dyadic tail sum_{i<=l} C(n, i) * 2 <=
0.05 * 2^n (cross-multiplied: 40 * tail <= 2^n, exact integers from
the multiplicative Pascal fold — the q387 machinery) gives the
tightest such interval. Reported with its EXACT achieved coverage
pair (cov_num = 2^n - 2 * tail, 2^n). n < 6 cannot reach 95%
(status='too_small'); order statistics are tie-aware (the q397
sort-free discipline).

Distributed shape: the permutation table is a generated dimension
(2^n rows, n <= 16), joined against a broadcast n-row value array —
the corpus never enters; the CI is one value-class rank window plus
a constant-size binomial fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exact_permutation_test", "median_ci"]


def exact_permutation_test(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int), n <= 16 -> ONE row (n, m, t_obs, p_num,
    p_den, p_ppm, status)."""
    s = df.select(
        (F.col(group_col) == 0).alias("is_a"),
        F.col(x_col).cast("long").alias("x"),
    )
    packed = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("is_a").cast("long")).alias("m"),
        F.sum("x").alias("s_tot"),
        F.sum(F.when(F.col("is_a"), F.col("x")).otherwise(0)).alias(
            "s_obs"
        ),
        F.sort_array(F.collect_list("x")).alias("vals"),
    )
    ok = (F.col("n") <= 16) & (F.col("m") >= 1) & (
        F.col("m") < F.col("n")
    )
    spark = df.sparkSession
    masks = spark.range(0, 1 << 16).select(F.col("id").alias("mask"))
    grid = packed.crossJoin(masks).where(
        F.col("mask") < F.expr("cast(1 as bigint) << cast(n as int)")
    )
    # popcount and masked sum via one fold over bit positions
    sub = F.expr(
        "aggregate(sequence(0, cast(n - 1 as int)),"
        " named_struct('cnt', cast(0 as bigint),"
        "              'ssum', cast(0 as bigint)),"
        " (acc, b) -> named_struct("
        "   'cnt', acc.cnt + cast(shiftright(mask, b) & 1 as bigint),"
        "   'ssum', acc.ssum + cast(shiftright(mask, b) & 1 as bigint)"
        "           * element_at(vals, b + 1)),"
        " acc -> acc)"
    )
    cells = grid.select(
        "n",
        "m",
        "s_tot",
        "s_obs",
        sub.alias("sub"),
    ).where(F.col("sub.cnt") == F.col("m"))
    t_obs = F.expr("abs(n * s_obs - m * s_tot)")
    agg = cells.select(
        "n",
        "m",
        t_obs.alias("t_obs"),
        F.expr("abs(n * sub.ssum - m * s_tot)").alias("t_perm"),
    ).groupBy("n", "m", "t_obs").agg(
        F.count(F.lit(1)).cast("long").alias("p_den"),
        F.sum(
            (F.col("t_perm") >= F.col("t_obs")).cast("long")
        ).alias("p_num"),
    )
    base = packed.select("n", "m").join(
        agg, ["n", "m"], "left"
    )
    return base.select(
        "n",
        "m",
        F.when(ok, F.col("t_obs")).alias("t_obs"),
        F.when(ok, F.col("p_num")).alias("p_num"),
        F.when(ok, F.col("p_den")).alias("p_den"),
        F.when(ok, F.expr("p_num * 1000000 div p_den")).alias(
            "p_ppm"
        ),
        F.when(~ok, F.lit("out_of_regime"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def median_ci(df: DataFrame, x_col: str = "x") -> DataFrame:
    """(x int), 6 <= n <= 62 -> ONE row (n, l, lo, hi, cov_num,
    cov_den, status): exact >= 95% order-statistic CI for the
    median. Outside the regime the row carries status
    'too_small' / 'out_of_regime' with NULL bounds (n >= 63 would
    wrap the dyadic coverage shift)."""
    x = F.col(x_col).cast("long")
    cls = df.select(x.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cls.select(
        "v",
        (F.sum("c").over(w) - F.col("c")).alias("below"),
        F.sum("c").over(w).alias("upto"),
    )
    tot = cls.groupBy().agg(F.sum("c").alias("n"))
    # largest l with 2 * sum_{i<=l} C(n, i) * 40 <= 2^n * 2... i.e.
    # 40 * tail(l) <= 2^n  (alpha = 0.05 two-sided, cross-multiplied)
    lsel = tot.select(
        "n",
        F.expr(
            "aggregate(sequence(1, cast(n div 2 as int)),"
            " named_struct('c', cast(1 as bigint),"
            "              'tail', cast(1 as bigint),"
            "              'l', cast(-1 as bigint),"
            "              'done', false),"
            " (acc, i) -> CASE WHEN acc.done THEN acc ELSE"
            "   named_struct("
            "     'c', acc.c * (n - i + 1) div i,"
            "     'tail', acc.tail + acc.c * (n - i + 1) div i,"
            "     'l', CASE WHEN 40 * acc.tail"
            "                     <= cast(1 as bigint)"
            "                        << cast(n as int)"
            "               THEN acc.l + 1 ELSE acc.l END,"
            "     'done', 40 * acc.tail"
            "             > cast(1 as bigint) << cast(n as int))"
            " END,"
            " acc -> acc)"
        ).alias("fold"),
    )
    # the fold walks l = 0, 1, ... accepting while the DOUBLED tail
    # (two-sided) stays within alpha; fold.l is the largest accepted
    sel = lsel.select(
        "n",
        F.greatest(F.col("fold.l"), F.lit(-1)).alias("l"),
    )
    # recompute the exact doubled tail for the chosen l for coverage
    cov = sel.select(
        "n",
        "l",
        F.when(F.col("l") < 0, F.lit(0).cast("long"))
        .when(F.col("l") == 0, F.lit(1).cast("long"))
        .otherwise(
            F.expr(
                "aggregate(sequence(1, cast(l as int)),"
                " named_struct('c', cast(1 as bigint),"
                "              'tail', cast(1 as bigint)),"
                " (acc, i) -> named_struct("
                "   'c', acc.c * (n - i + 1) div i,"
                "   'tail', acc.tail + acc.c * (n - i + 1) div i),"
                " acc -> acc.tail)"
            )
        )
        .alias("tail"),
    )
    bounds = cov.crossJoin(
        F.broadcast(
            ranked.groupBy().agg(
                F.collect_list(F.struct("v", "below", "upto")).alias(
                    "rk"
                )
            )
        )
    )
    lo = F.expr(
        "filter(rk, r -> r.below <= l AND r.upto > l)[0].v"
    )
    # 1-based position n - l: below < n - l <= upto
    hi = F.expr(
        "filter(rk, r -> r.below < n - l AND r.upto >= n - l)[0].v"
    )
    # r6 (ADVICE): gate the upper bound too — for n >= 63 the
    # (1 as bigint) << n coverage dyadics silently wrap, so surface
    # 'out_of_regime' instead of garbage (matches exact_permutation_test's
    # out-of-regime contract in this module).
    ok = (F.col("n") >= 6) & (F.col("n") <= 62) & (F.col("l") >= 0)
    return bounds.select(
        "n",
        F.when(ok, F.col("l")).alias("l"),
        F.when(ok, lo).alias("lo"),
        F.when(ok, hi).alias("hi"),
        F.when(
            ok,
            F.expr(
                "(cast(1 as bigint) << cast(n as int)) - 2 * tail"
            ),
        ).alias("cov_num"),
        F.when(
            ok, F.expr("cast(1 as bigint) << cast(n as int)")
        ).alias("cov_den"),
        F.when(F.col("n") > 62, F.lit("out_of_regime"))
        .when(~ok, F.lit("too_small"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
