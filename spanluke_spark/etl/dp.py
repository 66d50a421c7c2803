"""Sequential DP folds over bounded item sets: 0/1 knapsack
(Bellman 1957) and longest strictly-increasing subsequence via
patience tails (Fredman 1975) — the budgeted-selection and
longest-improving-run primitives of a crawl scheduler: "which pages
to fetch under a byte budget" is knapsack (the value-weighted
upgrade of the interval scheduler q377 and the divisor apportioner
q408), and "how long is the longest strictly improving quality run"
is LIS (the structural cousin of the records test q429: records
count the greedy prefix maxima, LIS finds the best subsequence).

Both run as ONE JVM-side aggregate() fold over a deterministically
ordered item array (sort_array over collect_list — the item set is
a bounded dimension, stated contract: <= ~10^3 items, capacity
<= ~10^4; the CORPUS never enters these folds):

  knapsack: dp[c] = best value within capacity c;
            per item (w, v): dp'[c] = max(dp[c],
                                  c >= w ? dp[c - w] + v : dp[c])
            — the classic capacity-array sweep, exact integers.

  LIS: tails[k] = smallest tail of any increasing subsequence of
       length k+1; per x: replace the FIRST tail >= x (found as
       size(filter(tails, t -> t < x)) — no binary search primitive,
       linear in the current LIS length) or append. The answer is
       size(tails); ties do NOT extend (strict increase, stated).

Both are pytest-gated against brute force (all 2^n subsets for
knapsack, all subsequences for LIS at small n), plus the
greedy-density-beaten knapsack lane, zero-capacity/all-fit closed
forms, and LIS monotone == n / reversed == 1 / records-dominance
(LIS >= record count, since prefix maxima form one increasing
subsequence). Oracles rebuild both DPs as recursive CTEs carrying
the dp array as a LIST (the q316 Pascal-row trick).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["knapsack", "lis_length"]


def knapsack(
    items: DataFrame,
    capacity: int,
    id_col: str = "id",
    w_col: str = "w",
    v_col: str = "v",
) -> DataFrame:
    """(id, w > 0, v >= 0) -> ONE row (n_items, capacity, total_w,
    total_v, best_value)."""
    if capacity < 0:
        raise ValueError("capacity must be >= 0")
    s = items.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(w_col).cast("long").alias("w"),
        F.col(v_col).cast("long").alias("v"),
    )
    packed = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_items"),
        F.sum("w").alias("total_w"),
        F.sum("v").alias("total_v"),
        F.sort_array(
            F.collect_list(F.struct("id", "w", "v"))
        ).alias("its"),
    )
    best = F.expr(
        "element_at(aggregate(its,"
        f" array_repeat(cast(0 as bigint), {capacity + 1}),"
        " (dp, it) -> transform(dp, (cur, c) ->"
        "   if(c >= it.w, greatest(cur,"
        "      element_at(dp, cast(c - it.w + 1 as int)) + it.v),"
        "      cur)),"
        " dp -> dp), -1)"
    )
    return packed.select(
        "n_items",
        F.lit(capacity).cast("long").alias("capacity"),
        F.coalesce(F.col("total_w"), F.lit(0)).alias("total_w"),
        F.coalesce(F.col("total_v"), F.lit(0)).alias("total_v"),
        F.coalesce(best, F.lit(0)).cast("long").alias("best_value"),
    )


def lis_length(
    df: DataFrame, t_col: str = "t", x_col: str = "x"
) -> DataFrame:
    """(t order key, x int) -> ONE row (n, lis_len): longest
    STRICTLY increasing subsequence length via the patience-tails
    fold."""
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(x_col).cast("long").alias("x"),
    )
    packed = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sort_array(F.collect_list(F.struct("t", "x"))).alias("seq"),
    )
    tails = F.expr(
        "aggregate(seq, cast(array() as array<bigint>),"
        " (acc, e) -> CASE"
        "   WHEN size(filter(acc, tt -> tt < e.x)) = size(acc)"
        "   THEN concat(acc, array(e.x))"
        "   ELSE transform(acc, (tt, i) ->"
        "     if(i = size(filter(acc, t2 -> t2 < e.x)), e.x, tt))"
        " END,"
        " acc -> size(acc))"
    )
    return packed.select(
        "n", F.coalesce(tails, F.lit(0)).cast("long").alias("lis_len")
    )
