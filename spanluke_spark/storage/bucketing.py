"""Bucketed tables: pre-shuffled storage so repeated joins/aggregations
on the same key never exchange again — the 100 TB technique for the
fact-to-fact joins a KG pipeline repeats every run (mentions x pages,
triples x lineage, clicks x purchases).

``bucketBy(n, key)`` hashes rows into a fixed bucket count AT WRITE TIME
(one shuffle, paid once); any later equi-join or aggregation on that key
between tables with compatible bucket counts planes as SortMergeJoin
over co-located buckets with ZERO Exchange on either side —
`tests/test_bucketing.py` asserts that on the physical plan, and
`assert_no_exchange` keeps it honest from production code too.

Iceberg note: the catalog seam (storage/tables.py) carries the same
bucket(n, url) transform natively; this module is the warehouse-table
equivalent for plain-Spark deployments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a parquet warehouse table bucketed (and
    optionally sorted) by ``key``. Sorting inside buckets lets the
    bucketed SortMergeJoin skip its per-task sort as well."""
    w = df.write.format("parquet").mode(mode).bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two bucketed tables on their bucket key — Catalyst sees the
    matching output partitionings and plans the join with no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), key, how)


def assert_no_exchange(df: DataFrame) -> None:
    """Raise if the physical plan contains a shuffle Exchange — the
    audit hook for plans that must stay co-located (bucketed joins,
    storage-partitioned scans). BroadcastExchange is allowed: broadcasts
    move the small side, not the bucketed data."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line and "BroadcastExchange" not in line:
            raise AssertionError(f"plan contains a shuffle Exchange:\n{plan}")
