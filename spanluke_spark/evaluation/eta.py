"""Correlation ratio eta-squared (Pearson 1905) — the ANOVA effect
size: what FRACTION of a numeric score's variance does a categorical
grouping explain? The verdict tests (Kruskal-Wallis q337,
Brown-Forsythe q358) say whether groups differ; eta^2 = SSB/SST says
how much it matters, the numeric sibling of Cramér's V (q375) and
the Gini gain (q374).

Exactness (the per-group once-quantized cell discipline): with group
sums T_j, sizes n_j, total T, Sxx = sum x^2, N rows,

  SSB_j / SST = (N*T_j - n_j*T)^2 / (n_j * N * (N*Sxx - T^2))

so each group contributes the once-quantized ppm cell

  cell = 10^6 (N*T_j - n_j*T)^2 div (n_j * N * (N*Sxx - T^2))

and eta2_ppm is their exact integer sum — no equal-size contract
needed (each cell carries its own n_j). Zero total variance
(N*Sxx == T^2) surfaces NULL. Pinned by pytest: a float SSB/SST
cross-check, group-structure-determines-value giving ~10^6 (exactly
when every division is exact), single-group giving exactly 0, and
the exact invariance under a global shift (both (N*T_j - n_j*T) and
N*Sxx - T^2 are shift-invariant — same algebra as q376).

Distributed shape: one per-group aggregate, one 1-row broadcast, one
final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["correlation_ratio"]


def correlation_ratio(
    rows: DataFrame,
    grp_col: str = "grp",
    value_col: str = "value",
) -> DataFrame:
    """(grp, value) -> ONE row (n, k, eta2_ppm)."""
    s = rows.select(
        F.col(grp_col).alias("grp"),
        F.col(value_col).cast("long").alias("x"),
    )
    per = s.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum("x").alias("tj"),
    )
    tot = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("t"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    cells = per.crossJoin(F.broadcast(tot)).select(
        "n",
        F.when(
            F.expr("n * sxx - t * t") > 0,
            F.expr(
                "1000000 * (n * tj - nj * t) * (n * tj - nj * t)"
                " div (nj * n * (n * sxx - t * t))"
            ),
        ).alias("cell"),
    )
    agg = cells.groupBy().agg(
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("cell").alias("eta2_ppm"),
    )
    return agg.select("n", "k", "eta2_ppm")
