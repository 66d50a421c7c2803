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
