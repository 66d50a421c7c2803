"""Trending-entities gates (streaming/stream.py sliding_entity_counts +
top_k_per_window): a REAL readStream -> writeStream run must emit the
same sliding-window counts as the batch evaluation of the identical
expression, each event must land in window/slide overlapping windows,
and the top-k rank must be deterministic under count ties.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime

from pyspark.sql import functions as F

from spanluke_spark.streaming.stream import (
    sliding_entity_counts,
    top_k_per_window,
)

SCHEMA = "entity string, ts timestamp"


def _mentions(spark, rows):
    return spark.createDataFrame(rows, "entity string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def test_sliding_counts_stream_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="trend_")
    try:
        rows = [
            ("courtA", "2024-01-01 10:01:00"),
            ("courtA", "2024-01-01 10:14:00"),
            ("courtA", "2024-01-01 10:16:00"),  # next slide bucket
            ("statuteB", "2024-01-01 10:01:00"),
            ("statuteB", "2024-01-01 11:05:00"),  # separate burst
            ("judgeC", "2024-01-01 10:59:00"),
        ]
        # far-future sentinel advances the watermark so append mode
        # flushes every real window before the stream drains
        sentinel = [("zz_sentinel", "2024-01-03 00:00:00")]
        _mentions(spark, rows + sentinel).coalesce(1).write.parquet(
            os.path.join(tmp, "in"), mode="append"
        )
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(tmp, "in"))
        )
        q = (
            sliding_entity_counts(stream)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("trend_out")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = [
            r
            for r in spark.table("trend_out").collect()
            if r["entity"] != "zz_sentinel"
        ]
        batch = sliding_entity_counts(_mentions(spark, rows)).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch))

        # every event lands in exactly window/slide = 4 windows
        per_event_windows = sum(r["n_mentions"] for r in batch)
        assert per_event_windows == 4 * len(rows)
        # the 10:00-11:00 window sees courtA's burst in full
        w10 = {
            r["entity"]: r["n_mentions"]
            for r in batch
            if r["window_start"] == datetime(2024, 1, 1, 10, 0)
        }
        assert w10 == {"courtA": 3, "statuteB": 1, "judgeC": 1}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_top_k_deterministic_tie_break(spark):
    counts = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", "b", 5),
            ("2024-01-01 10:00:00", "a", 5),  # tie -> entity asc wins
            ("2024-01-01 10:00:00", "c", 9),
            ("2024-01-01 10:00:00", "d", 1),
            ("2024-01-01 11:00:00", "x", 2),
        ],
        "window_start string, entity string, n_mentions long",
    ).withColumn("window_start", F.col("window_start").cast("timestamp"))
    got = [
        (r["window_start"].hour, r["entity"], r["rank"])
        for r in top_k_per_window(counts, k=3)
        .orderBy("window_start", "rank")
        .collect()
    ]
    assert got == [(10, "c", 1), (10, "a", 2), (10, "b", 3), (11, "x", 1)]
