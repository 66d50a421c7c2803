"""Sample autocorrelation function (ACF) per series — the
periodicity/memory member of the time-series audit family beside
Mann-Kendall trend (etl/trend.py), CUSUM level shifts and bursts: a
crawl host whose volume ACF spikes at lag 24 is diurnal, at lag 168
weekly; a quality series with high lag-1 ACF drifts rather than
jitters.

r_l = sum_{t} (x_t - mean)(x_{t+l} - mean) / sum_t (x_t - mean)^2

carried EXACTLY: with S = sum x and n = series length, multiply
numerator and denominator by n^2 so every term is the integer product
(n*x_t - S)(n*x_{t+l} - S):

  num_l = sum over lag-l pairs of c_t * c_{t+l},  c_t = n*x_t - S
  den   = sum_t c_t^2

acf_ppm = sign-split trunc-toward-zero of num_l * 10^6 / den (the
q292 rounding contract), emitted with the exact (num, den) rational.

Distributed shape: one stats agg per key, one centering join, one
lag-band self-join per key on bucket arithmetic (b_j = b_i + lag with
lags 1..L exploded from a literal sequence — L is a constant, not
data), one combinable sum. n per key is bounded by the bucketing (the
caller's contract, as in mann_kendall); keys scale out. Lags with no
pairs (series shorter than the lag, or bucket gaps) are omitted —
missing buckets contribute no pair, the standard lag-join semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["acf", "ljung_box"]


def acf(
    series: DataFrame,
    key_col: str = "key",
    bucket_col: str = "bucket",
    value_col: str = "x",
    max_lag: int = 6,
) -> DataFrame:
    """(key, bucket, x) -> (key, lag, n_pairs, acf_num, acf_den,
    acf_ppm) for lag in 1..max_lag. x must be integer-valued (counts
    or pre-quantized); duplicate (key, bucket) rows are an error the
    caller owns. acf_ppm is NULL for a constant series (den = 0)."""
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    base = series.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).cast("long").alias("b"),
        F.col(value_col).cast("long").alias("x"),
    )
    stats = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"), F.sum("x").alias("s")
    )
    cen = base.join(stats, "key").withColumn(
        "c", F.col("n") * F.col("x") - F.col("s")
    )
    den = cen.groupBy("key").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("acf_den")
    )
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    a = cen.select("key", "b", F.col("c").alias("ca")).select(
        "key", "b", "ca", lags
    )
    bb = cen.select(
        "key", F.col("b").alias("bj"), F.col("c").alias("cb")
    )
    num = (
        a.join(
            bb,
            (a["key"] == bb["key"]) & (bb["bj"] == a["b"] + a["lag"]),
        )
        .drop(bb["key"])
        .groupBy("key", "lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("acf_num"),
        )
    )
    out = num.join(den, "key")
    mag = F.expr("abs(acf_num) * 1000000 div acf_den")
    return out.withColumn(
        "acf_ppm",
        F.when(F.col("acf_den") == 0, F.lit(None).cast("long")).otherwise(
            F.when(F.col("acf_num") < 0, -mag).otherwise(mag)
        ),
    )


# chi-square(h) 0.95 quantiles x1000, h = 1..10 (public constants,
# quantized once; the verdict threshold is stated to the milli)
_CHI2_95_MILLI = {
    1: 3841, 2: 5991, 3: 7815, 4: 9488, 5: 11070,
    6: 12592, 7: 14067, 8: 15507, 9: 16919, 10: 18307,
}


def ljung_box(acf_out: DataFrame, h: int = 6) -> DataFrame:
    """Ljung-Box portmanteau test (Ljung & Box 1978) COMPOSED over
    the exact per-lag rationals ``acf`` emits — is the series white
    noise, jointly across lags 1..h?

      Q = n (n+2) * sum_{k=1..h} r_k^2 / (n - k)

    Exactness (the once-quantized cell discipline): each lag's cell
    quantizes the exact rational r_k^2/(n-k) once,

      cell_k = num_k^2 * 10^9 div (den^2 * (n - k))

    with num_k^2 and den^2 riding DECIMAL(38,0) / HUGEINT (both
    overflow int64 inside legal inputs), then

      q_milli = n * (n + 2) * sum(cell) div 10^6

    Verdict against the embedded chi-square(h) 0.95 quantile table
    (h <= 10; larger h surfaces NULL verdict). n is recovered as
    n_pairs + lag — valid for GAPLESS bucketed series, the caller's
    contract (acf drops missing-bucket pairs silently; a gapped
    series should be re-bucketed first). Constant series (den == 0)
    surfaces NULL.

    acf_out: the (key, lag, n_pairs, acf_num, acf_den, ...) frame
    from ``acf`` (lags >= 1) -> per key ONE row (key, n, h, q_milli,
    crit_milli, sig05)."""
    if h < 1:
        raise ValueError("h must be >= 1")
    lagged = acf_out.where(
        (F.col("lag") >= 1) & (F.col("lag") <= F.lit(h))
    ).select(
        "key",
        (F.col("n_pairs") + F.col("lag")).alias("n"),
        "lag",
        "acf_num",
        "acf_den",
    )
    cells = lagged.select(
        "key",
        "n",
        F.when(
            F.col("acf_den") > 0,
            F.expr(
                "cast(cast(acf_num as decimal(38,0)) * acf_num"
                " * 1000000000"
                " div (cast(acf_den as decimal(38,0)) * acf_den"
                "      * (n - lag)) as long)"
            ),
        ).alias("cell"),
    )
    agg = cells.groupBy("key").agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("h"),
        F.sum("cell").alias("cell_sum"),
    )
    crit = F.element_at(
        F.create_map(
            *[
                F.lit(v)
                for kv in _CHI2_95_MILLI.items()
                for v in kv
            ]
        ),
        F.col("h").cast("int"),
    )
    return agg.select(
        "key",
        "n",
        "h",
        F.when(
            F.col("cell_sum").isNotNull(),
            F.expr("n * (n + 2) * cell_sum div 1000000"),
        ).alias("q_milli"),
        crit.cast("long").alias("crit_milli"),
        F.when(
            F.col("cell_sum").isNotNull() & crit.isNotNull(),
            F.expr("n * (n + 2) * cell_sum div 1000000")
            > crit.cast("long"),
        ).alias("sig05"),
    )
