"""Misra-Gries mergeable heavy-hitter summaries (Misra & Gries 1982;
merge rule from Agarwal, Cormode, Huang, Phillips, Wei & Yi 2012,
"Mergeable Summaries", §3) — find the hot tokens / hot keys of a
crawl shard-by-shard with BOUNDED summary state per shard, the
deterministic companion to the count-min sketch (q-cms lane).

Two-level relational shape, no sequential counter loop anywhere:

  1. per-shard exact counts (groupBy — the map-side combine IS the
     level-0 summary; exact counts are an MG summary with zero error)
  2. per-shard PRUNE to k counters: subtract the (k+1)-st largest
     shard count from every counter, keep the positive ones — the
     paper's size-reduction step, per-item error <= n_shard/(k+1)
  3. MERGE = groupBy(token) sum of pruned counters (counter addition
     is the paper's merge), then one final prune to k

Determinism at rank boundaries is pinned by (count DESC, token ASC)
row_number; counters equal to the threshold prune to zero and drop.

Guarantees (tested, not asserted at runtime): estimates only ever
UNDERCOUNT; per-item undercount <= sum of the S+1 prune thresholds
<= 2n/(k+1); every token with true frequency > 2n/(k+1) survives into
the final summary. Distributed shape: two shuffles (shard counts,
merged counts), two tiny per-group top-(k+1) windows — shard
summaries are <= k rows each, so the merge input is <= S·k rows
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["misra_gries"]


def _prune(counts: DataFrame, k: int, part_cols: list[str]) -> DataFrame:
    """Keep at most k counters per group: subtract the (k+1)-st largest
    count (0 if the group is already <= k) and drop non-positives."""
    w = Window.partitionBy(*part_cols).orderBy(
        F.col("cnt").desc(), F.col("token").asc()
    )
    ranked = counts.withColumn("rnk", F.row_number().over(w))
    thr = (
        ranked.where(F.col("rnk") == k + 1)
        .select(*part_cols, F.col("cnt").alias("thr"))
        if part_cols
        else ranked.where(F.col("rnk") == k + 1).select(
            F.col("cnt").alias("thr")
        )
    )
    joined = (
        ranked.join(F.broadcast(thr), part_cols, "left")
        if part_cols
        else ranked.crossJoin(
            F.broadcast(thr.groupBy().agg(F.max("thr").alias("thr")))
        )
    )
    return joined.where(F.col("rnk") <= k).select(
        *part_cols,
        "token",
        (F.col("cnt") - F.coalesce(F.col("thr"), F.lit(0)))
        .cast("long")
        .alias("cnt"),
    ).where(F.col("cnt") > 0)


def misra_gries(
    tokens: DataFrame,
    k: int,
    shard_col: str = "shard",
    token_col: str = "token",
) -> DataFrame:
    """(shard, token) one row per occurrence -> (token, f_hat, rnk):
    the final <=k-counter summary, rnk by (f_hat DESC, token ASC)."""
    t = tokens.select(
        F.col(shard_col).alias("shard"), F.col(token_col).alias("token")
    )
    shard_counts = t.groupBy("shard", "token").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    pruned = _prune(shard_counts, k, ["shard"])
    merged = pruned.groupBy("token").agg(F.sum("cnt").alias("cnt"))
    final = _prune(merged, k, [])
    w = Window.orderBy(F.col("f_hat").desc(), F.col("token").asc())
    return (
        final.select("token", F.col("cnt").alias("f_hat"))
        .withColumn("rnk", F.row_number().over(w))
    )
