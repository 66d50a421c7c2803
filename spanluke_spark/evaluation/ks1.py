"""One-sample Kolmogorov-Smirnov test against the discrete uniform
(Kolmogorov 1933; the conservative discrete application per
Noether 1963) — "are the hash buckets / shard assignments / sampled
offsets actually uniform?" The SPECIFIED-distribution companion of
the two-sample KS (q267) and the chi-squared GOF (q281): KS reads
the worst CUMULATIVE deviation, which catches smooth drifts
(everything shifted right) that per-bucket chi-squared dilutes.

With observations in buckets 0..K-1 (range audited), n total, and
cumulative counts cum_b over the FULL support (empty buckets
included — the running CDF still steps past them):

  d_num_b = | K * cum_b - n * (b + 1) |      (exact integers;
             D = max_b d_num_b / (n * K))
  d_ppm   = 10^6 * max(d_num) div (n * K)

Verdict by the asymptotic 5% Kolmogorov point 1.358/sqrt(n),
sqrt-free by squaring (stated, conservative on discrete support):

  sig05 iff 10^6 * maxnum^2 * n > 1844164 * (n*K)^2
  (1.844164 = 1.358^2, quantized constant)

Exact lanes pytest-pinned: a perfectly balanced table (n divisible
by K, equal buckets) gives d_num == n exactly at every interior
step... precisely: max = 0 only when cum_b == n(b+1)/K at every b —
the balanced table achieves d_ppm == 0 EXACTLY; a one-bucket pileup
gives the closed form d_ppm = 10^6 (K-1) div K. Out-of-range
values surface status='out_of_range' with NULL D (never silently
clamped); empty input NULL.

Distributed shape: one bucket-count aggregate, a K-row generated
support joined in (K is a constant), one cumulative window over K
rows, one aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ks_uniform"]


def ks_uniform(
    df: DataFrame, k_support: int, bucket_col: str = "bucket"
) -> DataFrame:
    """(bucket in 0..k_support-1) -> ONE row (n, k, max_d_num,
    d_ppm, sig05, status)."""
    if k_support < 2:
        raise ValueError("k_support must be >= 2")
    b = F.col(bucket_col).cast("long")
    counts = df.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    oob = counts.where(
        (F.col("b") < 0) | (F.col("b") >= k_support)
    ).groupBy().agg(F.coalesce(F.sum("c"), F.lit(0)).alias("n_oob"))
    spark = df.sparkSession
    support = spark.range(k_support).select(
        F.col("id").alias("b")
    )
    grid = support.join(counts, "b", "left").select(
        "b", F.coalesce(F.col("c"), F.lit(0).cast("long")).alias("c")
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    tot = grid.groupBy().agg(F.sum("c").alias("n"))
    steps = grid.select(
        "b", F.sum("c").over(w).alias("cum")
    ).crossJoin(F.broadcast(tot))
    dev = steps.select(
        "n",
        F.abs(
            F.lit(k_support) * F.col("cum")
            - F.col("n") * (F.col("b") + 1)
        ).alias("d_num"),
    )
    agg = dev.groupBy("n").agg(F.max("d_num").alias("max_d_num"))
    base = agg.crossJoin(F.broadcast(oob))
    ok = (F.col("n") > 0) & (F.col("n_oob") == 0)
    return base.select(
        "n",
        F.lit(k_support).cast("long").alias("k"),
        "max_d_num",
        F.when(
            ok, F.expr(f"max_d_num * 1000000 div (n * {k_support})")
        ).alias("d_ppm"),
        F.when(
            ok,
            F.expr(
                "1000000 * max_d_num * max_d_num * n"
                f" > 1844164 * (n * {k_support})"
                f" * (n * {k_support})"
            ),
        ).alias("sig05"),
        F.when(F.col("n_oob") > 0, F.lit("out_of_range"))
        .when(F.col("n") == 0, F.lit("empty"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
