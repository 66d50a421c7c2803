"""Key-distribution profiling: the skew dashboard for shuffle planning.

Every operator in this engine that shuffles on a content key (dedup
buckets, CC stars, host aggregates, entity joins) has a skew story; this
is the op that MEASURES the skew before you pick one. Output: the top-K
heaviest keys with their share of rows and their multiple of the mean
key load — the two numbers that decide between plain hash join, AQE skew
split, and explicit salting.

Scale shape: one count aggregate (map-side combined), then top-K via
``orderBy().limit(k)`` — Spark plans that as TakeOrderedAndProject (a
per-partition heap + driver merge of K rows), NOT a global sort or a
single-partition window. The corpus-wide denominators ride a 1-row
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def key_skew_profile(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """-> (rank, key, n, share, x_mean): the ``top_k`` heaviest values of
    ``key_col`` (count desc, key asc tie-break), each with its fraction
    of all rows and its ratio to the mean per-key count."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    stats = counts.agg(
        F.sum("n").alias("_total"), F.count(F.lit(1)).alias("_keys")
    )
    top = counts.orderBy(F.desc("n"), F.asc("key")).limit(top_k)
    # the window below runs over <= top_k rows (already reduced) — bounded
    w = Window.orderBy(F.desc("n"), F.asc("key"))
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "n",
            (F.col("n") / F.col("_total")).alias("share"),
            (F.col("n") * F.col("_keys") / F.col("_total")).alias("x_mean"),
        )
    )
