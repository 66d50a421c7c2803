"""KMV (k-minimum-values) distinct-count sketch — the mergeable cardinality
sketch (Bar-Yossef et al. 2002) built on the engine's deterministic hashes,
so unlike HLL implementations it is EXACTLY replayable in the SQL oracle.

Estimator: hash items uniformly into [0, M); keep the k smallest distinct
hash values per group; if fewer than k distinct items exist the sketch is
exact, else estimate = (k - 1) / (kth_min / M). Relational shape: one
distinct-agg + one windowed top-k per group — map-side combine does the
heavy lifting, the shuffle carries at most k rows per (task, group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

M60 = float(1 << 60)  # portable_hash64 range


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    item: Column,
    k: int = 64,
) -> DataFrame:
    """-> (group_col, n_kept, kth_min, kmv_estimate): per-group distinct
    cardinality estimate. ``item`` is any expression; deterministic by
    construction (portable md5 hash, no RNG)."""
    hashed = (
        df.select(F.col(group_col).alias("g"), portable_hash64(item).alias("h"))
        .distinct()
    )
    w = Window.partitionBy("g").orderBy(F.asc("h"))
    topk = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return (
        topk.groupBy(F.col("g").alias(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("kth_min"),
        )
        .withColumn(
            "kmv_estimate",
            F.round(
                F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")).otherwise(
                    (k - 1) / (F.col("kth_min") / F.lit(M60))
                ),
                6,
            ),
        )
    )


def _cms_cell(item: Column, i: int, w: int) -> Column:
    """Row-i count-min column for ``item``: portable md5-derived hash mod w
    (salted with the row index) — identical in Spark and the SQL oracle."""
    return portable_hash64(F.concat(F.lit(f"{i}:"), item)) % w


def cms_build(df: DataFrame, item: Column, d: int = 3, w: int = 256) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as a relation:
    -> (hrow, col, cnt), at most d*w rows.

    The scale story: frequency estimation over an UNBOUNDED key space with
    FIXED shuffle width — the groupBy key is the (hrow, col) cell, so
    map-side combine collapses every task to <= d*w partial rows no matter
    how many distinct items flow through (vs an exact groupBy whose shuffle
    is O(distinct items)). Sketches merge by cell-wise addition, so
    per-day/per-shard sketches union + re-agg. Estimates only ever
    OVER-count (by <= 2N/w with probability 1 - (1/2)^d).
    """
    it = df.select(item.alias("item"))
    cells = it.select(
        F.posexplode(
            F.array(*[_cms_cell(F.col("item"), i, w) for i in range(d)])
        ).alias("hrow", "col")
    )
    return cells.groupBy("hrow", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, d: int = 3, w: int = 256
) -> DataFrame:
    """Point-query the sketch: -> (item, est) = min over the d cells.

    ``probes`` is (item); d and w must match the build. The sketch is at
    most d*w rows, so the join side is broadcast-sized by construction;
    an empty cell reads as 0.
    """
    pc = probes.select(
        "item",
        F.posexplode(
            F.array(*[_cms_cell(F.col("item"), i, w) for i in range(d)])
        ).alias("hrow", "col"),
    )
    return (
        pc.join(F.broadcast(sketch), ["hrow", "col"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
