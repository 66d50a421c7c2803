"""Sorted-neighborhood blocking (Hernández & Stolfo 1995) — the classic
ER candidate generator that complements the engine's other blockers
(normalization keys, Pass-Join segments, delete-1 neighborhoods,
meta-blocking): sort all records by a blocking key, slide a window of w
over the sorted order, emit every pair inside the window. Catches the
near-misses equality blocking drops (adjacent keys that share no exact
block) at a guaranteed O(n·w) candidate budget.

The global rank is computed WITHOUT a single-partition window — the
two-phase distributed ranking: records bucket by a fixed-length key
prefix; per-bucket counts (one map-side-combinable agg, at most
|alphabet|^prefix_len rows) get cumulative offsets through a window
over that TINY bucket relation only; the full-width row_number then
runs partitionBy(bucket) — every heavy window is keyed, the only
unkeyed window sees bounded rows. Pairs are emitted by exploding each
record's w-1 successor ranks and equi-joining on rank, so cross-bucket
neighbors are included exactly (the window slides over the GLOBAL
order, not per bucket).

Caveat baked into the contract: ranks are dense over the distinct
(key, id) order, ties broken by id, so the result is deterministic and
engine-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["sorted_neighborhood_pairs"]


def sorted_neighborhood_pairs(
    df: DataFrame,
    key_col: str = "key",
    id_col: str = "id",
    window: int = 3,
    prefix_len: int = 2,
) -> DataFrame:
    """(id, key) -> (id_a, id_b, key_a, key_b, rank_gap) for every pair
    within ``window`` positions of the (key, id) sorted order
    (rank_gap in 1..window-1; id_a is the earlier record)."""
    if window < 2:
        raise ValueError("window must be >= 2")
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("key"),
        F.substring(F.col(key_col), 1, prefix_len).alias("_b"),
    ).distinct()
    counts = keyed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    # cumulative offsets over the bounded bucket relation (<= alphabet^p rows)
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(wb), F.lit(0)).alias("_off")
    )
    wr = Window.partitionBy("_b").orderBy("key", "id")
    ranked = (
        keyed.join(F.broadcast(offsets), "_b")
        .withColumn("_r", F.col("_off") + F.row_number().over(wr))
        .select("id", "key", "_r")
    )
    probes = ranked.select(
        F.col("id").alias("id_a"),
        F.col("key").alias("key_a"),
        F.col("_r").alias("_ra"),
        F.explode(
            F.sequence(F.col("_r") + 1, F.col("_r") + (window - 1))
        ).alias("_rb"),
    )
    return (
        probes.join(
            ranked.select(
                F.col("id").alias("id_b"),
                F.col("key").alias("key_b"),
                F.col("_r").alias("_rb"),
            ),
            "_rb",
        )
        .select(
            "id_a",
            "id_b",
            "key_a",
            "key_b",
            (F.col("_rb") - F.col("_ra")).cast("int").alias("rank_gap"),
        )
    )
