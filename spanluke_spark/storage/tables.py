"""S6/S7: table IO seam — Iceberg when a catalog is configured, partitioned
parquet otherwise (SURVEY.md §7.0).

The partition spec is identical either way: bucket(n_buckets, url) as
part_key + optional day(warc_ts). On a cluster with the Iceberg runtime jar:

    spark = get_spark(extra_conf={
        "spark.sql.catalog.cc": "org.apache.iceberg.spark.SparkCatalog",
        "spark.sql.catalog.cc.type": "hive",
    })
    read_table(spark, "cc.db.pages")  # -> catalog path

Locally everything resolves to parquet directories with the same layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _is_catalog_ref(ref: str) -> bool:
    return "/" not in ref and ref.count(".") >= 2


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:  # noqa: BLE001
        return False


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """ref = catalog table ("cat.db.pages") or a parquet path."""
    if _is_catalog_ref(ref):
        return spark.read.table(ref)
    return spark.read.parquet(ref)


def iceberg_partition_spec(
    bucket_col: str | None = None,
    n_buckets: int = 64,
    day_col: str | None = None,
) -> list:
    """The north-star partition transforms as DataFrameWriterV2 arguments:
    ``bucket(n_buckets, url)`` (+ optional ``days(warc_ts)``) — Iceberg's
    native transforms, so the catalog prunes on them without a derived
    column. The parquet fallback computes the identical layout explicitly
    (storage.lineage.with_part_key)."""
    from pyspark.sql.functions import partitioning

    spec = []
    if bucket_col:
        spec.append(partitioning.bucket(n_buckets, bucket_col))
    if day_col:
        spec.append(partitioning.days(day_col))
    return spec


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    partition_transforms: list | None = None,
) -> None:
    """Partitioned write; identical partition layout on either backend.

    Catalog branch contract (pinned by tests/test_iceberg_seam.py with a
    recording fake, since no Iceberg runtime jar ships in this sandbox):
    ``df.writeTo(ref)`` + ``partitionedBy(*partition_transforms)`` on table
    (re)creation, then ``append()`` / ``createOrReplace()`` by mode."""
    if _is_catalog_ref(ref):
        writer = df.writeTo(ref)
        if mode == "append":
            writer.append()
        else:
            if partition_transforms:
                writer = writer.partitionedBy(*partition_transforms)
            writer.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (Spark-native bucketing; Iceberg's
    bucket(n, col) transform is the catalog twin). Joins and aggregations
    keyed on ``bucket_cols`` between tables bucketed the same way run
    SHUFFLE-FREE — at 100 TB this removes the dominant exchange from every
    repeated fact-fact join. Pair with sortBy for merge-join-ready buckets."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def prune_scan(pages: DataFrame, langs: list[str] | None = None, since_ts: str | None = None) -> DataFrame:
    """P8: pruning predicates expressed so they push down to the scan
    (Iceberg partition pruning / parquet row-group skipping). Verify with
    .explain(): the filters must appear under PushedFilters."""
    out = pages
    if langs:
        out = out.filter(F.col("lang").isin(langs))
    if since_ts:
        out = out.filter(F.col("warc_ts") >= since_ts)
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_by: str,
    target_rows_per_file: int = 1_000_000,
    partitions: list | None = None,
) -> dict:
    """Small-file compaction for an append-accumulated partitioned table —
    the standing operational task at 10^12 rows, where per-epoch/per-delta
    appends leave thousands of tiny files per partition and scan task count
    explodes (Iceberg twin: rewrite_data_files).

    Rewrites each partition into at most ceil(rows/target) files: rows are
    assigned a deterministic file slot (hash mod n_files per partition), one
    shuffle keyed by (partition, slot) co-locates each output file's rows,
    and the write is a dynamic partition overwrite — idempotent, untouched
    partitions keep their files. ``partitions`` restricts the pass (compact
    only what lineage says changed). The planner collect() is one row per
    partition — bounded by the bucket count, not the data.

    Returns {"partitions": n, "rows": n} for the compacted slice.
    """
    df = spark.read.parquet(path)
    if partitions is not None:
        df = df.filter(F.col(partition_by).isin(partitions))

    counts = {
        r[partition_by]: r["n"]
        for r in df.groupBy(partition_by).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return {"partitions": 0, "rows": 0}

    files_per_part = {
        part: max(1, -(-n // target_rows_per_file)) for part, n in counts.items()
    }
    n_files = F.lit(1)
    for part, nf in files_per_part.items():
        n_files = F.when(F.col(partition_by) == part, F.lit(nf)).otherwise(n_files)
    slot = F.pmod(F.xxhash64(*df.columns), n_files)
    # Explicit numPartitions (= total desired files): REPARTITION_BY_NUM is
    # honored by AQE, whereas an un-numbered repartition gets coalesced back
    # to few tasks on small deltas — which would collapse fat partitions to
    # one file/task again.
    total_files = sum(files_per_part.values())
    compacted = (
        df.withColumn("_slot", slot)
        .repartition(total_files, F.col(partition_by), F.col("_slot"))
        .drop("_slot")
    )
    from .lineage import overwrite_partitions

    # coalesce_output=False: the (partition, _slot) repartition above already
    # fixed the file layout at ceil(rows/target) files per partition; the
    # default re-repartition on the partition column alone would collapse each
    # partition back to one task/file (OOM + straggler on fat partitions).
    overwrite_partitions(compacted, path, partition_by, coalesce_output=False)
    return {"partitions": len(counts), "rows": sum(counts.values())}
