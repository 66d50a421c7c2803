"""Burst detection over event/crawl time series — flag time buckets
whose volume spikes against the key's own baseline (z-score form of
Kleinberg burst detection's first level): breaking-news detection in a
crawl stream, abuse spikes in a frontier, hot-topic windows for
re-crawl scheduling.

Two-pass relational shape: one (key, bucket) count aggregate over the
raw stream, one per-key baseline aggregate (mean + population stddev)
over the SMALL bucket table, one broadcastable join back. No windows —
the baseline join is keyed on the key column only, and the bucket table
is |keys| x |buckets|, tiny next to the event stream. A key with zero
variance (perfectly steady) yields NULL z-scores and never flags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_bursts(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    bucket: str = "day",
    z_threshold: float = 2.0,
) -> DataFrame:
    """events(key, ts, ...) -> (key, bucket_start, n, mean_n, std_n,
    zscore, is_burst): per-bucket volume with the key's own baseline
    and the z_threshold flag. ``bucket`` is any date_trunc unit."""
    counts = events.groupBy(
        F.col(key_col).alias("key"),
        F.date_trunc(bucket, F.col(ts_col)).alias("bucket_start"),
    ).agg(F.count(F.lit(1)).alias("n"))
    baseline = counts.groupBy("key").agg(
        F.avg("n").alias("mean_n"),
        F.stddev_pop("n").alias("std_n"),
    )
    # no broadcast hint: baseline is one row per key, which is tiny for
    # event types but can be 10^8 rows for per-host keys — let AQE pick
    # broadcast when it actually fits
    decorated = counts.join(baseline, "key").select(
        "key",
        "bucket_start",
        "n",
        "mean_n",
        "std_n",
        F.try_divide(F.col("n") - F.col("mean_n"), F.col("std_n")).alias(
            "zscore"
        ),
    )
    return decorated.withColumn(
        "is_burst",
        F.coalesce(F.col("zscore") > z_threshold, F.lit(False)),
    )
