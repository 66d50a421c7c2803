"""Single-outlier tests: Grubbs (Grubbs 1950) and Dixon's Q (Dixon
1950) — is the most extreme point of a small metric slice (per-host
latency panel, per-shard doc-count audit) a real outlier? The
parametric/order-statistic companions of the robust MAD fence
(q156): MAD flags everything past a fence; Grubbs/Dixon score THE
single most suspect point, which is what a triage dashboard sorts by.

Grubbs exactness (the q382 n-scaled centering): G = |x* - mean|/s
with s^2 = Szz / (n (n-1)) for the centered moment Szz = n*Sxx - Sx^2, so

  g2_milli = 1000 * maxdev^2 * (n - 1) div (n * Szz),
  maxdev   = max(n*max(x) - Sx, Sx - n*min(x)),
  Szz      = n*Sxx - Sx^2   (so sum (x - mean)^2 = Szz / n)

— exact integers, one trunc; the suspect is max(x) when the upper
deviation wins, min(x) otherwise (upper wins ties, stated). The
algebraic bound G^2 <= (n-1)^2 / n is pytest-pinned. Constant data
(Szz == 0) surfaces NULL.

Dixon exactness: with order statistics x(1) <= ... <= (n),

  q_min_ppm = 10^6 * (x(2) - x(1))   div (x(n) - x(1))
  q_max_ppm = 10^6 * (x(n) - x(n-1)) div (x(n) - x(1))

the r10 ratios for the low and high end. Order statistics respect
DUPLICATES (a tied extreme zeroes its gap — the correct "not lonely"
verdict), computed without any sort: x(2) = x(1) when x(1) is tied,
else min over x > x(1) — one unconditional aggregate plus one
conditional re-aggregate against the broadcast extremes. Zero range
surfaces NULL. Contract: Dixon's r10 is tabled for 3 <= n <= ~30;
n < 3 surfaces NULL (the caller owns slice sizing).

Long-bound contract: maxdev^2 * 1000 needs n * max|x| <= ~10^6
(the q330 bounded-slice discipline).

Distributed shape: Grubbs is ONE moments aggregate; Dixon is one
extremes aggregate + one gap aggregate under a broadcast 1-row join.
Keys would scale out the same way (these are the per-slice kernels).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["grubbs", "dixon_q"]


def grubbs(df: DataFrame, x_col: str = "x") -> DataFrame:
    """(x int) -> ONE row (n, suspect, maxdev, szz, g2_milli):
    exact squared Grubbs statistic for the most extreme point."""
    x = F.col(x_col).cast("long")
    agg = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
        F.min(x).alias("mn"),
        F.max(x).alias("mx"),
    )
    base = agg.select(
        "n",
        "mn",
        "mx",
        (F.col("n") * F.col("mx") - F.col("sx")).alias("dev_hi"),
        (F.col("sx") - F.col("n") * F.col("mn")).alias("dev_lo"),
        (
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        ).alias("szz"),
    )
    return base.select(
        "n",
        F.when(
            F.col("dev_hi") >= F.col("dev_lo"), F.col("mx")
        )
        .otherwise(F.col("mn"))
        .alias("suspect"),
        F.greatest("dev_hi", "dev_lo").alias("maxdev"),
        "szz",
        F.when(
            (F.col("szz") > 0) & (F.col("n") > 1),
            F.expr(
                "1000 * greatest(dev_hi, dev_lo)"
                " * greatest(dev_hi, dev_lo) * (n - 1)"
                " div (n * szz)"
            ),
        ).alias("g2_milli"),
    )


def dixon_q(df: DataFrame, x_col: str = "x") -> DataFrame:
    """(x int) -> ONE row (n, x1, x2, xn1, xn, q_min_ppm,
    q_max_ppm): the r10 gap ratios at both ends; NULL on zero range
    or n < 3."""
    x = F.col(x_col).cast("long")
    ext = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.min(x).alias("x1"),
        F.max(x).alias("xn"),
    )
    rows = df.select(x.alias("v")).crossJoin(F.broadcast(ext))
    gaps = rows.groupBy("n", "x1", "xn").agg(
        F.sum((F.col("v") == F.col("x1")).cast("long")).alias("c1"),
        F.sum((F.col("v") == F.col("xn")).cast("long")).alias("cn"),
        F.min(F.when(F.col("v") > F.col("x1"), F.col("v"))).alias(
            "above_min"
        ),
        F.max(F.when(F.col("v") < F.col("xn"), F.col("v"))).alias(
            "below_max"
        ),
    )
    x2 = F.when(F.col("c1") >= 2, F.col("x1")).otherwise(
        F.col("above_min")
    )
    xn1 = F.when(F.col("cn") >= 2, F.col("xn")).otherwise(
        F.col("below_max")
    )
    base = gaps.select(
        "n",
        "x1",
        F.coalesce(x2, F.col("x1")).alias("x2"),
        F.coalesce(xn1, F.col("xn")).alias("xn1"),
        "xn",
    )
    ok = (F.col("n") >= 3) & (F.col("xn") > F.col("x1"))
    return base.select(
        "n",
        "x1",
        "x2",
        "xn1",
        "xn",
        F.when(
            ok, F.expr("(x2 - x1) * 1000000 div (xn - x1)")
        ).alias("q_min_ppm"),
        F.when(
            ok, F.expr("(xn - xn1) * 1000000 div (xn - x1)")
        ).alias("q_max_ppm"),
    )
