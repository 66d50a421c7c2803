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


def cusum_changepoints(
    series: DataFrame,
    key_col: str = "key",
    t_col: str = "t",
    x_col: str = "x",
    k: float = 0.5,
    h: float = 4.0,
    target: float | None = None,
) -> DataFrame:
    """Two-sided CUSUM change-point detection (Page 1954) over per-key
    time series — the SEQUENTIAL drift detector detect_bursts is not:
    a z-score burst flags one loud bucket; CUSUM accumulates small
    persistent shifts (a host slowly ramping its publish rate, crawl
    freshness decaying) and alarms when the cumulative evidence clears
    ``h``, with allowance ``k`` absorbing in-control noise.

    The textbook recursion S+_t = max(0, S+_{t-1} + (x_t - mu) - k) is
    not a plain running sum, but it has the classic closed form
    S+_t = cum_t - min(0, min_{j<=t} cum_j) over cum = running sum of
    (x - mu - k) — two stacked window passes over ONE partitioning by
    the key (a single shuffle; the repo's SCD2 windows share the same
    discipline), which is what both this plan and the DuckDB oracle
    compute. ``target`` fixes mu explicitly; None self-calibrates to
    the per-key mean (one keyed aggregate + join). Rows per (key, t)
    are assumed unique (pre-aggregate counts first).

    Returns every row with (s_plus, s_minus, alarm) — filter on alarm
    for change points; the first alarmed t per key is the estimated
    change location upper bound.
    """
    from pyspark.sql import Window

    if target is None:
        mu_df = series.groupBy(key_col).agg(F.avg(x_col).alias("_mu"))
        j = series.join(mu_df, key_col)
        mu = F.col("_mu")
    else:
        j = series
        mu = F.lit(float(target))
    w = (
        Window.partitionBy(key_col)
        .orderBy(t_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    up = F.col(x_col) - mu - F.lit(k)
    dn = -(F.col(x_col) - mu) - F.lit(k)
    j = j.select(
        key_col, t_col, x_col,
        F.sum(up).over(w).alias("_cu"),
        F.sum(dn).over(w).alias("_cd"),
    )
    j = j.select(
        key_col, t_col, x_col,
        (F.col("_cu") - F.least(F.lit(0.0), F.min("_cu").over(w))).alias(
            "_sp"
        ),
        (F.col("_cd") - F.least(F.lit(0.0), F.min("_cd").over(w))).alias(
            "_sm"
        ),
    )
    return j.select(
        key_col,
        t_col,
        x_col,
        F.round("_sp", 6).alias("s_plus"),
        F.round("_sm", 6).alias("s_minus"),
        ((F.col("_sp") > h) | (F.col("_sm") > h)).alias("alarm"),
    )
