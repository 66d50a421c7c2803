"""Concentration / inequality panel over host traffic shares —
Theil's entropy index (Theil 1967) and the Hoover (Pietra /
Robin-Hood) index side by side, completing the skew toolbox around
the Gini lane (profile.py) and the Zipf fit: Theil is the
information-theoretic score (decomposable across host groups), Hoover
is "what fraction of the crawl budget would have to move to make
hosts equal" — the direct operational read.

Exactness discipline: with per-unit counts x_i (total S, n units),

  Theil  T = sum (x_i/S) * ln(n*x_i/S)
  theil_num = sum x_i * lnppm(n*x_i, S)      (round-ln-ppm cells,
                                              q307 discipline; 0 for
                                              x_i = 0 by the x*ln x
                                              limit)
  theil_ppm = sign-split trunc  theil_num div S

  Hoover H = sum |x_i/S - 1/n| / 2  — EXACT, no logs:
  hoover_num = sum |n*x_i - S|
  hoover_ppm = hoover_num * 10^6 div (2*n*S)

Equal shares give every Theil cell exactly 0 and hoover_num = 0;
full concentration on one unit gives theil_ppm = round(ln n * 10^6)
and hoover_ppm = (n-1)/n exactly — all gated. S = 0 surfaces NULL.

Distributed shape: one (unit) groupBy, one 1-row broadcast of
(n, S), one aggregate — corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["inequality_panel"]


def inequality_panel(
    units: DataFrame, unit_col: str = "unit", weight_col: str = "w"
) -> DataFrame:
    """(unit, w: long >= 0) pre-aggregated or raw (one row per
    occurrence with w = 1 works too) -> ONE row (n_units, total,
    theil_num, theil_ppm, hoover_num, hoover_ppm)."""
    per = units.groupBy(F.col(unit_col).alias("unit")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("x")
    )
    tot = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("s"),
    )
    x = per.crossJoin(F.broadcast(tot))
    lncell = F.round(
        F.log((F.col("x") * F.col("n")) / F.col("s")) * 1_000_000
    ).cast("long")
    agg = x.groupBy().agg(
        F.max("n").alias("n_units"),
        F.max("s").alias("total"),
        F.sum(
            F.when(F.col("x") > 0, F.col("x") * lncell).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("theil_num"),
        F.sum(F.abs(F.col("n") * F.col("x") - F.col("s"))).alias(
            "hoover_num"
        ),
    )
    tmag = F.expr("abs(theil_num) div total")
    return agg.select(
        "n_units",
        "total",
        "theil_num",
        F.when(
            F.col("total") > 0,
            F.when(F.col("theil_num") < 0, -tmag).otherwise(tmag),
        ).alias("theil_ppm"),
        "hoover_num",
        F.when(
            F.col("total") > 0,
            F.expr("hoover_num * 1000000 div (2 * n_units * total)"),
        ).alias("hoover_ppm"),
    )
