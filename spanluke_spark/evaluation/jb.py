"""Jarque-Bera normality test (Jarque & Bera 1980) and the robust
location panel (trimmed + winsorized means; Tukey 1962) — is a
metric slice even roughly Gaussian (before anyone quotes z-scores
from it), and what is its location once the tails are disciplined?
Complements the outlier lanes (Grubbs/Dixon q396/q397 flag points;
JB indicts the whole shape) and the robust spread lane (MAD q156).

JB exactness — the central-moment clearing cancels every power of n:
with S = sum x, and the raw power sums Q2, Q3, Q4,

  A2 = n*Q2 - S^2                      (= n^2 * m2)
  A3 = n^2*Q3 - 3*n*Q2*S + 2*S^3      (= n^3 * m3)
  A4 = n^3*Q4 - 4*n^2*Q3*S + 6*n*Q2*S^2 - 3*S^4   (= n^4 * m4)

  skew^2    = m3^2 / m2^3 = A3^2 / A2^3        (n^6 cancels)
  kurtosis  = m4 / m2^2   = A4 / A2^2          (n^4 cancels)
  JB = n * (skew^2 / 6 + (kurt - 3)^2 / 24)
     = n * (4 * A3^2 * A2 + (A4 - 3*A2^2)^2) / (24 * A2^4)

one DECIMAL(38)/HUGEINT division to jb_milli, verdict at the
chi-square(2) point 5991. Symmetric data makes A3 == 0 EXACTLY (the
skew component vanishes with no rounding — pytest-pinned); constant
data (A2 == 0) surfaces NULL. Long-bound contract: A3^2 * A2 climbs
like n^8 * max|x|^8 — n <= ~200 with |x| <= ~30 keeps the cleared
numerator inside 38 digits (bounded slices, the q330 discipline).

Robust location, exact order statistics (no sort of the raw rows —
one rank window over value classes): with g = floor(n * trim_ppm /
10^6) cut from EACH end,

  trimmed_milli    = 1000 * sum of the middle n - 2g values
                     div (n - 2g)
  winsorized_milli = 1000 * (middle sum + g * (lowest kept value)
                     + g * (highest kept value)) div n

g >= n/2 (nothing left) surfaces NULL. Closed forms pytest-pinned:
trim 0 == plain mean; one wild outlier moves the plain mean but
leaves the trimmed/winsorized means at their no-outlier values;
trimmed == winsorized == median-ish on symmetric data.

Distributed shape: JB is ONE power-sum aggregate; the robust panel
is one value-class aggregate + one bounded rank window + one
conditional aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["jarque_bera", "robust_location"]


def jarque_bera(df: DataFrame, x_col: str = "x") -> DataFrame:
    """(x int) -> ONE row (n, a2, a3, skew2_milli, exkurt_milli,
    jb_milli, sig05)."""
    x = F.col(x_col).cast("long")
    agg = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("q2"),
        F.sum(x * x * x).alias("q3"),
        F.sum(x * x * x * x).alias("q4"),
    )
    base = agg.select(
        "n",
        F.expr("n * q2 - s * s").alias("a2"),
        F.expr(
            "cast(n as decimal(38,0)) * n * q3"
            " - 3 * cast(n as decimal(38,0)) * q2 * s"
            " + 2 * cast(s as decimal(38,0)) * s * s"
        ).alias("a3"),
        F.expr(
            "cast(n as decimal(38,0)) * n * n * q4"
            " - 4 * cast(n as decimal(38,0)) * n * q3 * s"
            " + 6 * cast(n as decimal(38,0)) * q2 * s * s"
            " - 3 * cast(s as decimal(38,0)) * s * s * s"
        ).alias("a4"),
    )
    ok = (F.col("n") >= 4) & (F.col("a2") > 0)
    skew2 = F.expr(
        "cast(a3 * a3 * 1000"
        " div (cast(a2 as decimal(38,0)) * a2 * a2) as long)"
    )
    exkurt = F.expr(
        "cast((a4 - 3 * cast(a2 as decimal(38,0)) * a2) * 1000"
        " div (cast(a2 as decimal(38,0)) * a2) as long)"
    )
    jb = F.expr(
        "cast(cast(n as decimal(38,0))"
        " * (4 * a3 * a3 * a2"
        "    + (a4 - 3 * cast(a2 as decimal(38,0)) * a2)"
        "      * (a4 - 3 * cast(a2 as decimal(38,0)) * a2))"
        " * 1000"
        " div (24 * cast(a2 as decimal(38,0)) * a2 * a2 * a2)"
        " as long)"
    )
    return base.select(
        "n",
        "a2",
        F.expr("cast(a3 as long)").alias("a3"),
        F.when(ok, skew2).alias("skew2_milli"),
        F.when(ok, exkurt).alias("exkurt_milli"),
        F.when(ok, jb).alias("jb_milli"),
        F.when(ok, jb > 5991).alias("sig05"),
    )


def robust_location(
    df: DataFrame, trim_ppm: int = 100_000, x_col: str = "x"
) -> DataFrame:
    """(x int) -> ONE row (n, g, mean_milli, trimmed_milli,
    winsorized_milli)."""
    if not 0 <= trim_ppm < 500_000:
        raise ValueError("trim_ppm must be in [0, 500000)")
    x = F.col(x_col).cast("long")
    cls = df.select(x.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ranked = cls.select(
        "v",
        "c",
        (F.sum("c").over(w) - F.col("c")).alias("below"),
        F.sum("c").over(w).alias("upto"),
    )
    tot = cls.groupBy().agg(F.sum("c").alias("n"))
    g = F.expr(f"n * {trim_ppm} div 1000000")
    dec = ranked.crossJoin(F.broadcast(tot)).select(
        "*",
        g.alias("g"),
    )
    # per value class: how many of its copies survive the trim
    kept = F.expr(
        "greatest(cast(0 as bigint),"
        " least(upto, n - g) - greatest(below, g))"
    )
    lo_kept = F.expr(
        "CASE WHEN upto > g AND below < n - g THEN v END"
    )
    agg = dec.select(
        "n",
        "g",
        "v",
        kept.alias("kept"),
        lo_kept.alias("is_kept_v"),
    ).groupBy("n", "g").agg(
        F.sum(F.col("kept") * F.col("v")).alias("mid_sum"),
        F.sum("kept").alias("mid_n"),
        F.min("is_kept_v").alias("lo_v"),
        F.max("is_kept_v").alias("hi_v"),
    )
    # sign-split truncs so Spark div == DuckDB // on negative sums
    mean_row = df.select(x.alias("v")).groupBy().agg(
        F.expr(
            "CASE WHEN sum(v) < 0"
            " THEN -(abs(sum(v)) * 1000 div count(*))"
            " ELSE abs(sum(v)) * 1000 div count(*) END"
        ).alias("mean_milli")
    )
    base = agg.crossJoin(F.broadcast(mean_row))
    ok = F.col("mid_n") > 0
    return base.select(
        "n",
        "g",
        "mean_milli",
        F.when(
            ok,
            F.expr(
                "CASE WHEN mid_sum < 0"
                " THEN -(abs(mid_sum) * 1000 div mid_n)"
                " ELSE abs(mid_sum) * 1000 div mid_n END"
            ),
        ).alias("trimmed_milli"),
        F.when(
            ok,
            F.expr(
                "CASE WHEN mid_sum + g * lo_v + g * hi_v < 0"
                " THEN -(abs(mid_sum + g * lo_v + g * hi_v)"
                "        * 1000 div n)"
                " ELSE abs(mid_sum + g * lo_v + g * hi_v)"
                "      * 1000 div n END"
            ),
        ).alias("winsorized_milli"),
    )
