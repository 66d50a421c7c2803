"""Mann-Kendall trend test (Mann 1945; Kendall 1975) per series — the
monotone-trend member of the time-series audit family: CUSUM
(textops/cusum) finds level SHIFTS, MAD-CDC flags outlier buckets,
bursts.py flags spikes; Mann-Kendall answers "is this host's volume /
quality drifting up or down at all?", nonparametrically, no
distribution assumed and robust to the heavy tails crawl series have.

S = sum over bucket pairs i<j of sign(x_j - x_i). Under H0 (no trend)
E[S] = 0 and 18*Var(S) = n(n-1)(2n+5) - sum_t t(t-1)(2t+5) over tie
groups of size t (the standard tie correction). The normal-approx
test |z| > z_alpha with z = (S -+ 1)/sqrt(Var) is evaluated here as an
EXACT INTEGER inequality — (|S|-1)^2 * 18 * 10^6 > var18 * round(z_a^2
* 10^6) — so the verdict carries no float, no sqrt, and replays
bit-identically in SQL (the same trick as the bandit lane's squared
elimination radius, etl/bandit.py).

Distributed shape: series are (key, bucket, x) — one self-join per key
on bucket_i < bucket_j gives the O(n^2) pair terms with n = buckets
per key (bounded small: hours/days), keyed and combinable; ties come
from one (key, x) groupBy. Keys scale out; n does not grow with the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mann_kendall", "theil_sen"]

# round(z^2 * 1e6) for the two-sided 95% / 99% normal quantiles
Z2_PPM = {95: 3_841_459, 99: 6_634_897}


def mann_kendall(
    series: DataFrame,
    key_col: str = "key",
    bucket_col: str = "bucket",
    value_col: str = "x",
    confidence: int = 95,
) -> DataFrame:
    """(key, bucket, x) -> per key: (key, n, s, var18, trend) where
    trend in {'increasing','decreasing','no_trend'} by the exact
    integer Mann-Kendall test at the given confidence (95 or 99).
    x must be exactly comparable (integers or already-quantized);
    duplicate (key, bucket) rows are an error the caller owns."""
    if confidence not in Z2_PPM:
        raise ValueError(f"confidence must be one of {sorted(Z2_PPM)}")
    z2 = Z2_PPM[confidence]
    base = series.select(
        F.col(key_col).alias("key"),
        F.col(bucket_col).alias("b"),
        F.col(value_col).alias("x"),
    )
    a = base.select("key", F.col("b").alias("bi"), F.col("x").alias("xi"))
    c = base.select("key", F.col("b").alias("bj"), F.col("x").alias("xj"))
    s = (
        a.join(c, "key")
        .where(F.col("bi") < F.col("bj"))
        .groupBy("key")
        .agg(
            F.sum(
                F.when(F.col("xj") > F.col("xi"), 1)
                .when(F.col("xj") < F.col("xi"), -1)
                .otherwise(0)
            ).alias("s")
        )
    )
    n = base.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        base.groupBy("key", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("key")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    out = (
        n.join(s, "key")
        .join(ties, "key")
        .select(
            "key",
            "n",
            F.col("s").cast("long").alias("s"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            ).cast("long").alias("var18"),
        )
    )
    # exact test: |s| >= 2 and (|s|-1)^2 * 18 * 1e6 > var18 * z2_ppm
    sig = (F.abs(F.col("s")) >= 2) & (
        (F.abs(F.col("s")) - 1) * (F.abs(F.col("s")) - 1) * 18 * 1000000
        > F.col("var18") * z2
    )
    return out.withColumn(
        "trend",
        F.when(~sig, F.lit("no_trend"))
        .when(F.col("s") > 0, F.lit("increasing"))
        .otherwise(F.lit("decreasing")),
    )


def theil_sen(
    series: DataFrame,
    t_col: str = "t",
    y_col: str = "y",
    max_n: int = 200,
) -> DataFrame:
    """Theil-Sen slope estimator (Theil 1950; Sen 1968) — the MAGNITUDE
    companion to ``mann_kendall`` above: MK says a host's quality IS
    drifting, Theil-Sen says how fast, robustly (the median of all
    pairwise slopes has a 29% breakdown point where OLS has 0%).
    ``series(t, y)`` -> ONE row (n, n_pairs, slope_ppm, lo_ppm,
    hi_ppm): the median pairwise slope plus the min/max as a crude
    envelope.

    Exactness discipline: every pairwise slope is quantized ONCE to
    sign-split trunc-ppm, slope_ppm = (y_j - y_i) * 10^6 div
    (t_j - t_i) over pairs with t_i < t_j; the median over the
    quantized values is pinned by a (slope_ppm, ti, tj) row_number
    (even counts take the LOWER median — documented, deterministic,
    no averaging of two quantized values). The pair join is the
    definitional O(n^2) baseline, gated to ``max_n`` rows by an
    explicit filter contract like the kNN/LOF evaluation slices.
    Duplicate-t pairs (vertical slopes) are excluded, the standard
    convention. Fewer than 2 distinct t surfaces an empty frame."""
    import pyspark.sql.functions as _F
    from pyspark.sql import Window as _W

    s = series.select(
        _F.col(t_col).cast("long").alias("t"),
        _F.col(y_col).cast("long").alias("y"),
    ).limit(max_n)
    b = s.select(_F.col("t").alias("tj"), _F.col("y").alias("yj"))
    num = _F.col("yj") - _F.col("y")
    mag = _F.expr("abs(yj - y) * 1000000 div (tj - t)")
    pairs = (
        s.join(b, _F.col("t") < _F.col("tj"))
        .select(
            "t",
            "tj",
            _F.when(num < 0, -mag).otherwise(mag).alias("slope_ppm"),
        )
    )
    w = _W.orderBy("slope_ppm", "t", "tj")
    ranked = pairs.select(
        "slope_ppm",
        _F.row_number().over(w).alias("rn"),
    )
    stats = ranked.groupBy().agg(
        _F.count(_F.lit(1)).cast("long").alias("n_pairs"),
        _F.min("slope_ppm").alias("lo_ppm"),
        _F.max("slope_ppm").alias("hi_ppm"),
    )
    cnt = s.groupBy().agg(_F.count(_F.lit(1)).cast("long").alias("n"))
    med = (
        ranked.crossJoin(_F.broadcast(stats))
        .where(_F.col("rn") == _F.expr("(n_pairs + 1) div 2"))
        .select(_F.col("slope_ppm").alias("slope_med"))
    )
    return (
        cnt.crossJoin(_F.broadcast(stats))
        .crossJoin(_F.broadcast(med))
        .select(
            "n",
            "n_pairs",
            _F.col("slope_med").alias("slope_ppm"),
            "lo_ppm",
            "hi_ppm",
        )
    )
