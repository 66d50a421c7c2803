"""Herfindahl-Hirschman concentration (Hirschman 1945; Herfindahl
1950) of a crawl over its hosts — the antitrust-style "is the corpus
dominated by a few sources" number that complements the
inequality panel (q344: Theil/Hoover) and the skew profile (q88):
HHI is THE quantity dedup and mixture policy react to, and its
inverse is the "effective number of hosts" a mixture weight table
(q85) actually draws from.

With per-unit counts c_i, n units, N = sum c_i, S2 = sum c_i^2:

  hhi_ppm  = 10^6 * S2 div N^2                  (sum of squared
                                                 shares, exact)
  nhhi_ppm = 10^6 * (n*S2 - N^2) div (N^2*(n-1))  (normalized to
                                                 [0,1]; n = 1 NULL)
  enp_milli = 1000 * N^2 div S2                 (effective number of
                                                 units, 1/HHI)

all exact integer rationals, one trunc each. Closed forms pinned by
pytest: equal shares give hhi = 10^6 div n, nhhi = 0 and
enp = 1000*n EXACTLY (N = n*c makes every division exact); a
monopoly gives exactly (10^6, 10^6, 1000); merging two units adds
exactly 2*c_a*c_b to S2 (the merger-review identity). Long bound:
S2 <= N^2 needs N <= ~3*10^6 for the ppm scaling — per-slice
contract, documented like q361's.

Distributed shape: one (unit) count aggregate + one global aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hhi_panel"]


def hhi_panel(
    rows: DataFrame,
    unit_col: str = "unit",
) -> DataFrame:
    """rows(unit) -> ONE row (n_units, total, s2, hhi_ppm, nhhi_ppm,
    enp_milli): concentration of row counts over units."""
    per = rows.groupBy(F.col(unit_col).alias("unit")).agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_units"),
        F.coalesce(F.sum("c"), F.lit(0).cast("long")).alias("total"),
        F.coalesce(
            F.sum(F.col("c") * F.col("c")), F.lit(0).cast("long")
        ).alias("s2"),
    )
    hhi = F.when(
        F.col("total") > 0,
        F.expr("1000000 * s2 div (total * total)"),
    )
    nhhi = F.when(
        (F.col("total") > 0) & (F.col("n_units") > 1),
        F.expr(
            "1000000 * (n_units * s2 - total * total)"
            " div (total * total * (n_units - 1))"
        ),
    )
    enp = F.when(
        F.col("s2") > 0, F.expr("1000 * total * total div s2")
    )
    return agg.select(
        "n_units",
        "total",
        "s2",
        hhi.alias("hhi_ppm"),
        nhhi.alias("nhhi_ppm"),
        enp.alias("enp_milli"),
    )
