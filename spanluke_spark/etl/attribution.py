"""Multi-touch conversion attribution over event paths — which channel
(referrer class, crawl source, campaign) gets credit for a conversion:
first-touch, last-touch, and linear, the three standard position
models. The funnel lane (etl/funnel.py) counts stage progression;
attribution ALLOCATES each conversion back across the touches that
preceded it, with the path resetting at the previous conversion (the
industry-standard lookback rule).

Relational shape: conversions get their per-user previous-conversion
boundary from one lag window; touches attach to their conversion by a
per-user interval join (prev_conv < touch_ts <= conv_ts — per-user
path lengths are small, the canonicalize.py per-key quadratic
argument); per-path first/last channels are min/max over
struct(ts, channel) (partial-combining aggregates, no extra window),
and linear credit is 1/path_length per touch. Touches with no later
conversion earn nothing, conversions with no touches allocate nothing
— both pinned by tests.
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
    conv = (
        events.filter(F.col(conv_col))
        .select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("cts")
        )
        .withColumn(
            "prev",
            F.lag("cts").over(
                Window.partitionBy("u").orderBy(F.col("cts").asc())
            ),
        )
    )
    touches = events.filter(~F.col(conv_col)).select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(channel_col).alias("ch"),
    )
    path = (
        touches.join(conv, "u")
        .filter(
            (F.col("ts") <= F.col("cts"))
            & (F.col("prev").isNull() | (F.col("ts") > F.col("prev")))
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
