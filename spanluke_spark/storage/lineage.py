"""S8/A8: per-partition lineage rows + checkpointed resume (north_rule).

Mechanism (works identically on Iceberg or the local parquet fallback):

1. Pages are bucketed into deterministic partitions: ``part_key =
   pmod(xxhash64(url), n_buckets)`` — size-balanced, stable across runs.
2. Each completed partition writes a lineage row (counts + content checksum).
3. Resume = anti-join the page stream against completed part_keys: already
   materialized partitions are never recomputed, so re-runs are idempotent
   (exactly-once per partition).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_SCHEMA = (
    "run_id string, part_key int, n_pages long, n_mentions long, "
    "n_triples long, checksum long, completed_at timestamp"
)


def with_part_key(df: DataFrame, key_col: str = "url", n_buckets: int = 64) -> DataFrame:
    """Deterministic size-balanced bucket id (the Iceberg ``bucket(n, url)``
    transform, computed explicitly for the parquet fallback)."""
    return df.withColumn(
        "part_key", F.pmod(F.xxhash64(key_col), F.lit(n_buckets)).cast("int")
    )


def read_lineage(spark: SparkSession, lineage_path: str) -> DataFrame:
    if os.path.exists(lineage_path):
        return spark.read.parquet(lineage_path)
    return spark.createDataFrame([], LINEAGE_SCHEMA)


def pending_partitions(pages: DataFrame, lineage: DataFrame) -> DataFrame:
    """U2: left_anti against completed part_keys — the resume filter."""
    done = lineage.select("part_key").distinct()
    return pages.join(done, "part_key", "left_anti")


def lineage_rows(
    triples: DataFrame,
    pages: DataFrame,
    mentions: DataFrame,
    run_id: str,
) -> DataFrame:
    """A8: per-partition metrics + content checksum (sum of row hashes —
    order-insensitive, so identical regardless of task scheduling)."""
    p = pages.groupBy("part_key").agg(F.count(F.lit(1)).alias("n_pages"))
    m = mentions.groupBy("part_key").agg(F.count(F.lit(1)).alias("n_mentions"))
    t = triples.groupBy("part_key").agg(
        F.count(F.lit(1)).alias("n_triples"),
        # modular sum of row hashes: order-insensitive, ANSI-overflow-free
        F.sum(F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(2147483647))).alias("checksum"),
    )
    return (
        p.join(m, "part_key", "left")
        .join(t, "part_key", "left")
        .select(
            F.lit(run_id).alias("run_id"),
            "part_key",
            "n_pages",
            F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
            F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
            F.coalesce("checksum", F.lit(0)).alias("checksum"),
            F.current_timestamp().alias("completed_at"),
        )
    )


def lineage_rows_from_written(
    spark: SparkSession,
    triples_path: str,
    part_pages: list[tuple[int, int]],
    run_id: str,
) -> DataFrame:
    """A8 derived from the WRITTEN triples files (read-back aggregate) —
    the scale-safe replacement for persisting the full delta: n_pages comes
    from the driver-frozen per-partition counts captured BEFORE any write
    (one small collect, <= n_buckets rows); n_triples/checksum/n_mentions
    are aggregated from the files the run just committed, so lineage always
    describes exactly what is on disk. ``n_mentions`` counts DISTINCT
    mention sites (url, start, end) surviving triple dedupe — deterministic
    because build_triples keeps the minimal offsets per triple."""
    parts = [int(pk) for pk, _ in part_pages]
    agg = (
        spark.read.parquet(triples_path)
        .filter(F.col("part_key").isin(parts))
        .groupBy("part_key")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            # modular sum of row hashes: order-insensitive, overflow-free
            F.sum(
                F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(2147483647))
            ).alias("checksum"),
            F.countDistinct("url", "start", "end").alias("n_mentions"),
        )
    )
    p = spark.createDataFrame(
        [(int(pk), int(n)) for pk, n in part_pages], "part_key int, n_pages long"
    )
    return p.join(agg, "part_key", "left").select(
        F.lit(run_id).alias("run_id"),
        "part_key",
        "n_pages",
        F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
        F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
        F.coalesce("checksum", F.lit(0)).alias("checksum"),
        F.current_timestamp().alias("completed_at"),
    )


def append_parquet(df: DataFrame, path: str, partition_by: str | None = None) -> None:
    w = df.write.mode("append")
    if partition_by:
        w = w.partitionBy(partition_by)
    w.parquet(path)


def overwrite_partitions(
    df: DataFrame,
    path: str,
    partition_by: str | list[str],
    coalesce_output: bool = True,
) -> None:
    """Idempotent per-partition write: dynamic partition overwrite replaces
    exactly the partitions present in ``df`` and leaves the rest untouched.
    A crash-rerun of the same delta rewrites the same partitions instead of
    appending duplicates — the write-side half of the exactly-once-per-
    partition contract (the read side is the lineage anti-join).

    ``coalesce_output`` (default): shuffle on the partition columns first so
    each directory is written by ONE task — one file per partition instead
    of (tasks x partitions) shards. Right-sized when a partition's delta
    fits a task (the triples/lineage case); pass False for fatter deltas
    and let storage.tables.compact_partitions resize later."""
    spark = df.sparkSession
    cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    if coalesce_output:
        df = df.repartition(*[F.col(c) for c in cols])
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
