"""Native session windows + stream-stream interval join through REAL
readStream -> writeStream runs (file source, availableNow, memory sink),
each verified against its own batch-mode evaluation of the exact same
expression — the streaming/batch parity Structured Streaming guarantees.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from spanluke_spark.streaming.stream import interval_join, sessionized_counts

EV_SCHEMA = "event_id long, user_id string, ts timestamp, event_type string"


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id string, ts string, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _run_stream(spark, tmp, make_query, name):
    stream = (
        spark.readStream.schema(EV_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(tmp, "in"))
    )
    q = (
        make_query(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", os.path.join(tmp, f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.table(name)


def test_session_windows_stream_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="sess_")
    try:
        # u1: two sessions (10:00-10:10 burst, then 11:30); u2: one session;
        # boundary case: events exactly 30 min apart stay SEPARATE sessions
        rows = [
            (1, "u1", "2024-01-01 10:00:00", "click"),
            (2, "u1", "2024-01-01 10:10:00", "click"),
            (3, "u1", "2024-01-01 11:30:00", "click"),
            (4, "u2", "2024-01-01 09:00:00", "click"),
            (5, "u2", "2024-01-01 09:29:59", "click"),
            (6, "u3", "2024-01-01 08:00:00", "click"),
            (7, "u3", "2024-01-01 08:30:00", "click"),  # exactly gap apart
        ]
        # append-mode emits a session only after the watermark passes its
        # close bound: a far-future sentinel IN THE SAME FILE advances the
        # watermark after batch 1, so the engine's final flush batch emits
        # every real session before the stream ends (same-file placement is
        # deliberate — two files would race on mtime ordering under load)
        sentinel = [(99, "u9", "2024-01-02 00:00:00", "click")]
        _events(spark, rows + sentinel).coalesce(1).write.parquet(
            os.path.join(tmp, "in"), mode="append"
        )

        got = [
            r
            for r in _run_stream(
                spark, tmp, lambda s: sessionized_counts(s, ts="ts"), "sess_out"
            ).collect()
            if r["user_id"] != "u9"
        ]
        batch = sessionized_counts(
            _events(spark, rows), ts="ts"
        ).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
        u1 = sorted(
            (r["session_start"], r["n_events"]) for r in batch if r["user_id"] == "u1"
        )
        assert [n for _, n in u1] == [2, 1]
        u3 = [r["n_events"] for r in batch if r["user_id"] == "u3"]
        assert u3 == [2]  # events EXACTLY gap apart merge (inclusive bound)
        u2 = [r["n_events"] for r in batch if r["user_id"] == "u2"]
        assert u2 == [2]  # 29:59 < gap -> merged
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_interval_join_stream_matches_batch(spark):
    tmp = tempfile.mkdtemp(prefix="ivj_")
    try:
        clicks = [
            (1, "u1", "2024-01-01 10:00:00", "click"),
            (2, "u1", "2024-01-01 12:00:00", "click"),
            (3, "u2", "2024-01-01 10:00:00", "click"),
        ]
        purchases = [
            (10, "u1", "2024-01-01 10:30:00", "purchase"),  # matches click 1
            (11, "u1", "2024-01-01 12:59:00", "purchase"),  # matches click 2
            (12, "u1", "2024-01-01 09:00:00", "purchase"),  # before any click
            (13, "u2", "2024-01-01 11:30:00", "purchase"),  # > 1h after click 3
        ]
        # one coalesced file = one micro-batch: file order under load must
        # not let one side's watermark mark the other side's rows late
        _events(spark, clicks + purchases).coalesce(1).write.parquet(
            os.path.join(tmp, "in"), mode="append"
        )

        def build(ev):
            c = ev.filter(F.col("event_type") == "click").select(
                F.col("event_id").alias("click_id"),
                "user_id",
                F.col("ts").alias("click_ts"),
            )
            p = ev.filter(F.col("event_type") == "purchase").select(
                F.col("event_id").alias("purchase_id"),
                "user_id",
                F.col("ts").alias("purchase_ts"),
            )
            return interval_join(
                c, p, key="user_id", left_ts="click_ts",
                right_ts="purchase_ts", within="1 hour",
            )

        got = _run_stream(spark, tmp, build, "ivj_out").collect()
        pairs = sorted((r["click_id"], r["purchase_id"]) for r in got)
        assert pairs == [(1, 10), (2, 11)]
        batch = build(_events(spark, clicks + purchases)).collect()
        assert sorted(map(tuple, got)) == sorted(map(tuple, batch))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
