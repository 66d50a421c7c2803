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


def write_table(
    df: DataFrame,
    ref: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    """Partitioned write; identical partition columns on either backend."""
    if _is_catalog_ref(ref):
        writer = df.writeTo(ref)
        if mode == "append":
            writer.append()
        else:
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
