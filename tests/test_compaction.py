"""Small-file compaction: file count shrinks, data identical, untouched
partitions keep their files, rerun idempotent."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

from pyspark.sql import functions as F

from spanluke_spark.storage.tables import compact_partitions


def _files(path: str, part: str | None = None) -> list[str]:
    pat = os.path.join(path, part or "*", "*.parquet")
    return glob.glob(pat)


def test_compact_partitions(spark):
    tmp = tempfile.mkdtemp(prefix="compact_")
    try:
        # 12 tiny appends -> many small files across 2 partitions
        for i in range(12):
            spark.range(i * 50, i * 50 + 50).select(
                F.col("id"),
                (F.col("id") % 2).cast("int").alias("pk"),
            ).write.mode("append").partitionBy("pk").parquet(tmp)
        before = spark.read.parquet(tmp)
        before_rows = sorted(r["id"] for r in before.collect())
        n_before = len(_files(tmp))
        assert n_before >= 12

        stats = compact_partitions(spark, tmp, "pk", target_rows_per_file=1000)
        assert stats == {"partitions": 2, "rows": 600}

        after = spark.read.parquet(tmp)
        assert sorted(r["id"] for r in after.collect()) == before_rows
        n_after = len(_files(tmp))
        assert n_after < n_before
        assert n_after <= 2 * 2  # <= ceil(300/1000)=1 slot/partition, few tasks

        # rerun is a no-op in content and keeps file count stable
        stats2 = compact_partitions(spark, tmp, "pk", target_rows_per_file=1000)
        assert stats2["rows"] == 600
        assert sorted(r["id"] for r in spark.read.parquet(tmp).collect()) == before_rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_partitions_subset_leaves_others_alone(spark):
    tmp = tempfile.mkdtemp(prefix="compact_sub_")
    try:
        for i in range(6):
            spark.range(i * 20, i * 20 + 20).select(
                F.col("id"), (F.col("id") % 3).cast("int").alias("pk")
            ).write.mode("append").partitionBy("pk").parquet(tmp)
        untouched_before = sorted(_files(tmp, "pk=2"))
        stats = compact_partitions(
            spark, tmp, "pk", target_rows_per_file=1000, partitions=[0, 1]
        )
        assert stats["partitions"] == 2
        assert sorted(_files(tmp, "pk=2")) == untouched_before
        assert len(_files(tmp, "pk=0")) < 6
        assert spark.read.parquet(tmp).count() == 120
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_partitions_multiple_files_per_fat_partition(spark):
    """target_rows_per_file small enough to require >1 file per partition:
    the (partition, _slot) layout must survive the write — a collapse to one
    task/file per partition (the old coalesce_output=True path) would OOM on
    a fat partition at scale."""
    tmp = tempfile.mkdtemp(prefix="compact_fat_")
    try:
        spark.range(0, 600).select(
            F.col("id"), (F.col("id") % 2).cast("int").alias("pk")
        ).write.mode("overwrite").partitionBy("pk").parquet(tmp)
        before_rows = sorted(r["id"] for r in spark.read.parquet(tmp).collect())

        # 300 rows/partition, target 30 -> 10 slots per partition
        stats = compact_partitions(spark, tmp, "pk", target_rows_per_file=30)
        assert stats == {"partitions": 2, "rows": 600}
        for part in ("pk=0", "pk=1"):
            n = len(_files(tmp, part))
            assert 1 < n <= 10, (part, n)
        assert sorted(r["id"] for r in spark.read.parquet(tmp).collect()) == before_rows
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
