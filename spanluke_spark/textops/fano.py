"""Index of dispersion / Fano factor (Fisher 1950's Poisson
dispersion test) over per-bucket arrival counts — is crawl traffic
BURSTY? A Poisson process has variance == mean (VMR = 1); bot storms
and thundering-herd recrawls push VMR far above 1 (overdispersion),
a rate limiter or politeness scheduler pins it below 1 (regularity).
Complements the event-level burst detector (q110, Kleinberg-style)
with the classical one-number test.

Exactness: with per-bucket counts x_i (ZEROS INCLUDED — the caller
must supply empty buckets; dropping them biases VMR up), n buckets,
Sx = sum x, Sxx = sum x^2, the dispersion chi-squared
(n-1)s^2/xbar = (n*Sxx - Sx^2)/Sx and the variance-to-mean ratio
clear to ONE integer division each:

  chi2_milli = 1000 * (n*Sxx - Sx^2) div Sx        (df = n-1)
  vmr_milli  = 1000 * (n*Sxx - Sx^2) div ((n-1)*Sx)

Sx = 0 or n < 2 surfaces NULL. Closed forms pinned by pytest: a
constant count gives exactly 0; a single loaded bucket among n empty
ones gives vmr = 1000 * (n*c - c) div (n-1) = 1000*c exactly (the
maximal burst); direction labels over/under/exact at 1000 milli.

Distributed shape: ONE aggregate over the counts — nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["dispersion_index"]


def dispersion_index(
    counts: DataFrame,
    x_col: str = "x",
) -> DataFrame:
    """(x per-bucket count) -> ONE row (n, sx, sxx, chi2_milli,
    vmr_milli, direction)."""
    agg = counts.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.coalesce(F.sum(F.col(x_col).cast("long")), F.lit(0)).alias(
            "sx"
        ),
        F.coalesce(
            F.sum(F.col(x_col).cast("long") * F.col(x_col).cast("long")),
            F.lit(0),
        ).alias("sxx"),
    )
    ok = (F.col("n") >= 2) & (F.col("sx") > 0)
    chi2 = F.when(ok, F.expr("1000 * (n * sxx - sx * sx) div sx"))
    vmr = F.when(
        ok, F.expr("1000 * (n * sxx - sx * sx) div ((n - 1) * sx)")
    )
    x = agg.select(
        "n", "sx", "sxx", chi2.alias("chi2_milli"), vmr.alias("vmr_milli")
    )
    return x.select(
        "*",
        F.when(F.col("vmr_milli").isNull(), F.lit(None).cast("string"))
        .when(F.col("vmr_milli") > 1000, F.lit("overdispersed"))
        .when(F.col("vmr_milli") < 1000, F.lit("underdispersed"))
        .otherwise(F.lit("poisson_consistent"))
        .alias("direction"),
    )
