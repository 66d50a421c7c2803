"""Forecast backtest with exact MASE (Hyndman & Koehler 2006) — the
missing FORECAST member of the time-series audit family (trend q295,
ACF q298, CUSUM, bursts): crawl scheduling and capacity planning run
on per-host volume forecasts, and MASE is the scale-free error that
lets hosts of wildly different volumes share one dashboard.

Three deterministic forecasters from a fixed origin (train end) over
an H-bucket holdout:
  naive           f_t = x_last                        (integer)
  seasonal_naive  f_t = x_{t-m}                       (integer)
  ewma            f_t = sum_l w_l x_{last-l} / sum w_l (rational),
with truncated EWMA weights w_l = round(alpha (1-alpha)^l * 10^6),
alpha = 1/4, l < 24 — quantized ONCE per lag (exact-mantissa doubles,
identical in SQL), so the forecast is the exact rational
(f_num, f_den) and every error |x_t - f| = |x_t f_den - f_num| / f_den
has an INTEGER numerator.

  MASE = MAE / scale,  scale = in-sample seasonal-naive MAE
       = (mae_num * scale_den) / (mae_den * scale_num)
carried exactly, mase_ppm = trunc-ppm. Buckets missing on either side
of a lag lookup contribute no term (n_terms reports coverage).

Distributed shape: keys scale out; per key the work is lag
equi-joins and one 24-row weighted agg — series length is bounded by
the bucketing contract (<= 168 here), never by the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["forecast_backtest"]


def forecast_backtest(
    series: DataFrame,
    key_col: str = "key",
    bucket_col: str = "bucket",
    value_col: str = "x",
    n_buckets: int = 168,
    season: int = 24,
    horizon: int = 24,
    ewma_lags: int = 24,
) -> DataFrame:
    """(key, bucket in 0..n_buckets-1, x) -> per (key, method):
    (key, method, n_terms, mae_num, mae_den, scale_terms, scale_num,
    mase_ppm). Test = last `horizon` buckets; train = the rest."""
    split = n_buckets - horizon
    base = series.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).cast("long").alias("b"),
        F.col(value_col).cast("long").alias("x"),
    )
    train = base.where(F.col("b") < split)
    test = base.where(F.col("b") >= split)

    # in-sample seasonal-naive scale (shared by all methods)
    ta = train.select("key", "b", "x")
    tb = train.select(
        "key", (F.col("b") + season).alias("b"), F.col("x").alias("xl")
    )
    scale = (
        ta.join(tb, ["key", "b"])
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("scale_terms"),
            F.sum(F.abs(F.col("x") - F.col("xl")))
            .cast("long")
            .alias("scale_num"),
        )
    )

    # naive: last train value
    last = train.groupBy("key").agg(F.max("b").alias("lb"))
    lastv = (
        train.join(last, "key")
        .where(F.col("b") == F.col("lb"))
        .select("key", F.col("x").alias("f_num"))
        .withColumn("f_den", F.lit(1).cast("long"))
    )
    naive = (
        test.join(lastv, "key")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.abs(F.col("x") * F.col("f_den") - F.col("f_num"))
            ).cast("long").alias("err_num"),
            F.max("f_den").alias("f_den"),
        )
        .withColumn("method", F.lit("naive"))
    )

    # seasonal naive: per-bucket lag join
    sn_src = base.select(
        "key", (F.col("b") + season).alias("b"), F.col("x").alias("f")
    )
    seasonal = (
        test.join(sn_src, ["key", "b"])
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(F.abs(F.col("x") - F.col("f"))).cast("long").alias(
                "err_num"
            ),
        )
        .withColumn("f_den", F.lit(1).cast("long"))
        .withColumn("method", F.lit("seasonal_naive"))
    )

    # truncated EWMA over the train tail, weights quantized once
    tail = (
        train.join(last, "key")
        .select("key", "x", (F.col("lb") - F.col("b")).alias("l"))
        .where(F.col("l") < ewma_lags)
        .withColumn(
            "w",
            F.expr("cast(round(0.25 * power(0.75, l) * 1000000) as bigint)"),
        )
    )
    ew = tail.groupBy("key").agg(
        F.sum(F.col("w") * F.col("x")).cast("long").alias("f_num"),
        F.sum("w").cast("long").alias("f_den"),
    )
    ewma = (
        test.join(ew, "key")
        .groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum(
                F.abs(F.col("x") * F.col("f_den") - F.col("f_num"))
            ).cast("long").alias("err_num"),
            F.max("f_den").alias("f_den"),
        )
        .withColumn("method", F.lit("ewma"))
    )

    methods = naive.select(
        "key", "method", "n_terms", "err_num", "f_den"
    ).unionByName(
        seasonal.select("key", "method", "n_terms", "err_num", "f_den")
    ).unionByName(ewma.select("key", "method", "n_terms", "err_num", "f_den"))

    # two-stage trunc (mae_ppm first, then the scale ratio) keeps every
    # product ~10^11 even at 10^5-count buckets; the one-shot
    # err_num * scale_terms * 10^6 product would cross 2^63 at ~10x
    # this SF. Both stages replay verbatim in SQL.
    out = methods.join(scale, "key").select(
        "key",
        "method",
        "n_terms",
        F.col("err_num").alias("mae_num"),
        (F.col("n_terms") * F.col("f_den")).cast("long").alias("mae_den"),
        "scale_terms",
        "scale_num",
        F.when(
            (F.col("scale_num") > 0) & (F.col("n_terms") > 0),
            F.expr(
                "(err_num * 1000000 div (n_terms * f_den))"
                " * scale_terms div scale_num"
            ),
        ).alias("mase_ppm"),
    )
    return out
