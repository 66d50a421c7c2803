"""Cross-correlation function (CCF) between two aligned series per
key — the LEAD-LAG member of the time-series audit family: ACF
(etl/acf.py) asks "does this signal remember itself?", CCF asks
"does crawl volume LEAD error rate, and by how many buckets?". A
spike at positive lag l means x leads y by l; at negative lag, y
leads x.

r_xy(l) = sum_t (x_t - mx)(y_{t+l} - my)
          / sqrt(sum (x - mx)^2 * sum (y - my)^2)

Exactness (the acf n-scaled centering + the q354 signed-square
discipline): with n rows per key, cx_t = n*x_t - Sx and
cy_t = n*y_t - Sy are exact integers; the n^2 scalings cancel in the
ratio, and the square root never evaluates —

  num_l     = sum over lag-l pairs of cx_t * cy_{t+l}
  ccf2_ppm  = sign(num_l) * num_l^2 * 10^6 div (den_x * den_y)

(|r| = sqrt(|ccf2|/1e6)). The squares ride DECIMAL(38,0) in Spark /
HUGEINT in DuckDB — num^2 and den_x*den_y overflow int64 well inside
legitimate inputs; the QUOTIENT is <= 10^6 so the final cast back is
safe. Constant series on either side (den == 0) surfaces NULL.
Negative lags come from the same join with the offset applied to x —
one exploded literal lag band -L..L, never a data-sized explode.

Long-bound contract BEFORE the decimal stage: |cx| <= 2*n*max|x|
needs n * max|x| <= ~3e9 per key (the q330 bounded-slice contract);
the decimal stage then holds to 38 digits (num^2 * 10^6 at
n*max|x| = 1e6 is ~30 digits).

Distributed shape: one stats agg per key, one centering join, ONE
lag-band equi-join on bucket arithmetic, one combinable sum — keys
scale out, lags are a constant band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ccf"]


def ccf(
    series: DataFrame,
    key_col: str = "key",
    bucket_col: str = "bucket",
    x_col: str = "x",
    y_col: str = "y",
    max_lag: int = 4,
) -> DataFrame:
    """(key, bucket, x, y) -> (key, lag, n_pairs, ccf_num, den_x,
    den_y, ccf2_ppm) for lag in -max_lag..max_lag: y is shifted
    forward by lag relative to x. Duplicate (key, bucket) rows are
    an error the caller owns; missing buckets contribute no pair."""
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")
    base = series.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).cast("long").alias("b"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    stats = base.groupBy("key").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
    )
    cen = base.join(stats, "key").select(
        "key",
        "b",
        (F.col("n") * F.col("x") - F.col("sx")).alias("cx"),
        (F.col("n") * F.col("y") - F.col("sy")).alias("cy"),
    )
    dens = cen.groupBy("key").agg(
        F.sum(F.col("cx") * F.col("cx")).cast("long").alias("den_x"),
        F.sum(F.col("cy") * F.col("cy")).cast("long").alias("den_y"),
    )
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    a = cen.select("key", "b", "cx").select("key", "b", "cx", lags)
    bb = cen.select(
        "key", F.col("b").alias("bj"), F.col("cy").alias("cyj")
    )
    num = (
        a.join(
            bb,
            (a["key"] == bb["key"]) & (bb["bj"] == a["b"] + a["lag"]),
        )
        .drop(bb["key"])
        .groupBy("key", "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(F.col("cx") * F.col("cyj"))
            .cast("long")
            .alias("ccf_num"),
        )
    )
    out = num.join(dens, "key")
    mag = F.expr(
        "cast(ccf_num as decimal(38,0)) * ccf_num * 1000000"
        " div (cast(den_x as decimal(38,0)) * den_y)"
    )
    return out.select(
        "key",
        "lag",
        "n_pairs",
        "ccf_num",
        "den_x",
        "den_y",
        F.when(
            (F.col("den_x") == 0) | (F.col("den_y") == 0),
            F.lit(None).cast("long"),
        )
        .otherwise(
            F.when(F.col("ccf_num") < 0, -mag).otherwise(mag)
        )
        .alias("ccf2_ppm"),
    )
