"""Multi-touch conversion attribution over event paths — which channel
(referrer class, crawl source, campaign) gets credit for a conversion:
first-touch, last-touch, and linear, the three standard position
models. The funnel lane (etl/funnel.py) counts stage progression;
attribution ALLOCATES each conversion back across the touches that
preceded it, with the path resetting at the previous conversion (the
industry-standard lookback rule).

Relational shape: each touch finds its conversion with ONE window —
the running minimum of conversion timestamps over the FOLLOWING rows
per user (ordered by time). That single pass replaces the naive
per-user interval join, which is quadratic in touches x conversions
per user and detonates exactly when one user id aggregates a large
stream (measured in this repo: the join formulation ran minutes at
25 users x 500k events; the window runs in seconds — the DuckDB
oracle still replays the JOIN formulation, so the two independent
lowerings cross-check each other). The previous-conversion reset is
automatic: a touch's next conversion IS its path. Per-path first/last
channels are min/max over struct(ts, channel) (partial-combining
aggregates), linear credit is 1/path_length per touch. Touches with
no later conversion earn nothing, conversions with no touches
allocate nothing — both pinned by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["attribute_conversions"]


def attribute_conversions(
    events: DataFrame,
    user_col: str = "user",
    ts_col: str = "ts",
    channel_col: str = "channel",
    conv_col: str = "is_conversion",
) -> DataFrame:
    """-> (channel, model, credit): summed credit per channel under
    'first_touch', 'last_touch', and 'linear'. Timestamps are assumed
    unique per user (pre-aggregate if not)."""
    # "min conversion ts at-or-after me" computed as a RUNNING min over
    # the time-DESCENDING order — the UnboundedPreceding frame is the
    # O(n) streaming window; the equivalent UnboundedFollowing frame on
    # ascending order is not (measured: quadratic-like on long streams)
    w_next = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    path = (
        events.withColumn(
            "_nc",
            F.min(
                F.when(F.col(conv_col), F.col(ts_col))
            ).over(w_next),
        )
        .filter(~F.col(conv_col) & F.col("_nc").isNotNull())
        .select(
            F.col(user_col).alias("u"),
            F.col(ts_col).alias("ts"),
            F.col(channel_col).alias("ch"),
            F.col("_nc").alias("cts"),
        )
    )
    per_path = path.groupBy("u", "cts").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct("ts", "ch")).getField("ch").alias("first_ch"),
        F.max(F.struct("ts", "ch")).getField("ch").alias("last_ch"),
    )
    first = per_path.groupBy(F.col("first_ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("double").alias("credit")
    ).withColumn("model", F.lit("first_touch"))
    last = per_path.groupBy(F.col("last_ch").alias("channel")).agg(
        F.count(F.lit(1)).cast("double").alias("credit")
    ).withColumn("model", F.lit("last_touch"))
    linear = (
        path.join(per_path.select("u", "cts", "n"), ["u", "cts"])
        .groupBy(F.col("ch").alias("channel"))
        .agg(F.sum(1.0 / F.col("n")).alias("credit"))
        .withColumn("model", F.lit("linear"))
    )
    return (
        first.unionByName(last)
        .unionByName(linear)
        .select("channel", "model", F.round("credit", 6).alias("credit"))
    )
