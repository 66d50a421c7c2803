"""Weighted interval scheduling (the classic DP; Kleinberg & Tardos
ch. 6) — pick a non-overlapping subset of crawl/maintenance windows
of maximum total value. The politeness scheduler (q116) packs
unweighted requests greedily; when windows carry VALUE (expected new
pages, refresh urgency), greedy-by-end-time is arbitrarily bad and
the p(i)-indexed DP is the textbook fix.

Semantics: intervals are half-open [start, end) — end == start of
the next is compatible. Two relational tricks keep it scale-shaped:

1. p(i) (the last interval, in end-order, compatible with i) is NOT
   a join: union the end-events and start-queries onto one time axis
   and take a cumulative count of ends at each query row — ends sort
   before queries at equal t, so p(i) = #{j : end_j <= start_i},
   which in (end, start, w, i)-order IS the index of the last
   compatible interval. One window, no inequality join.
2. The sequential DP M[i] = max(M[i-1], w_i + M[p(i)]) folds over
   the end-sorted struct array with the ACCUMULATOR BEING THE WHOLE
   M PREFIX (the q369 widened-state pattern): random access to
   M[p(i)] is element_at on the growing array. The collected array
   is bounded by the MAX_N contract (the q330/q351 slice rule);
   everything before the fold is distributed.

Pinned by pytest: a full python DP replay, brute-force optimality on
every subset of <= 12-interval instances, non-overlapping == sum of
all weights, same-slot pile == max weight, and a fixture where
greedy-by-end-time is provably beaten.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["weighted_interval_schedule"]

MAX_N = 2000


def weighted_interval_schedule(
    intervals: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    weight_col: str = "weight",
) -> DataFrame:
    """(start, end, weight) -> ONE row (n_intervals, total_weight,
    best_weight, util_ppm)."""
    iv = intervals.select(
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
        F.col(weight_col).cast("long").alias("w"),
    ).where(F.col("e") > F.col("s"))
    wi = Window.orderBy("e", "s", "w")
    idx = iv.select("s", "e", "w", F.row_number().over(wi).alias("i"))
    ends = idx.select(
        F.col("e").alias("t"),
        F.lit(1).cast("long").alias("kind"),
        F.lit(None).cast("long").alias("i"),
    )
    starts = idx.select(
        F.col("s").alias("t"),
        F.lit(0).cast("long").alias("kind"),
        F.col("i"),
    )
    sweep = Window.orderBy(
        F.col("t").asc(), F.col("kind").desc()
    ).rowsBetween(Window.unboundedPreceding, 0)
    p = (
        ends.unionByName(starts)
        .select("i", F.sum("kind").over(sweep).alias("p"))
        .where(F.col("i").isNotNull())
    )
    packed = idx.join(p, "i").groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
        F.coalesce(F.sum("w"), F.lit(0).cast("long")).alias(
            "total_weight"
        ),
        F.sort_array(
            F.collect_list(F.struct("i", "w", "p"))
        ).alias("items"),
    )

    def step(acc: Column, x: Column) -> Column:
        skip = F.element_at(acc, F.size(acc))
        take = x.getField("w") + F.element_at(
            acc, (x.getField("p") + 1).cast("int")
        )
        return F.concat(acc, F.array(F.greatest(skip, take)))

    m = F.aggregate(
        F.col("items"),
        F.array(F.lit(0).cast("long")),
        step,
    )
    best = F.element_at(m, (F.col("n_intervals") + 1).cast("int"))
    out = packed.select(
        "n_intervals", "total_weight", best.alias("best_weight")
    )
    util = F.when(
        F.col("total_weight") > 0,
        F.expr("best_weight * 1000000 div total_weight"),
    )
    return out.select("*", util.alias("util_ppm"))
