"""Kruskal-Wallis H test (Kruskal & Wallis 1952) — the k-group
rank-based one-way ANOVA that extends the Mann-Whitney machinery of
the ROC lane (q296) past two groups: do k crawl sources draw their
quality scores from the same distribution, without normality
assumptions the parametric tests would need?

Exactness discipline (the q330 double-rank + staged-trunc shape):
fractional average ranks are carried as integer DOUBLE-ranks
dr = 2*rank() + cnt - 1, so per-group rank sums DRj are exact. With
Rj = DRj/2, the classic statistic

  H = 12/(n(n+1)) * sum_j Rj^2/nj - 3(n+1)

is staged as (each stage sized to the long bound):

  rj2q_j = DRj^2 * 250000 div nj          (once-quantized ppm cell;
                                           the /4 of Rj = DRj/2 is
                                           folded into the 250000)
  h_ppm  = 12 * sum_j rj2q_j div (n(n+1)) - 3(n+1) * 10^6

and the tie correction C = 1 - sum(t^3 - t)/(n^3 - n) is applied by
exact cross-multiplication:

  hc_ppm = h_ppm * (n^3 - n) div (n^3 - n - sum(t^3 - t))

All-tied data (C = 0) surfaces NULL. Significance is the integer
comparison hc_ppm >= crit_ppm against a CALLER-SUPPLIED published
chi-squared critical value (df = k-1 is data-dependent, so the
constant lives driver-side like the SPRT lane's, q327).

Distributed shape: one global rank window (bounded evaluation slice,
as q330), one (grp) groupBy, one tie groupBy, two 1-row broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kruskal_wallis"]


def kruskal_wallis(
    samples: DataFrame,
    crit_ppm: int,
    grp_col: str = "grp",
    value_col: str = "value",
) -> DataFrame:
    """(grp, value) -> ONE row (n, k, sum_rj2q, h_ppm, tie_cube,
    hc_ppm, sig): H with tie correction, once-quantized per-group
    cells, exact integer everything else."""
    w = Window.orderBy(value_col)
    c = Window.partitionBy(value_col)
    t = samples.select(
        F.col(grp_col).alias("grp"),
        F.col(value_col).alias("value"),
        (2 * F.rank().over(w) + F.count(F.lit(1)).over(c) - 1)
        .cast("long")
        .alias("dr"),
    )
    per = t.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("nj"),
        F.sum("dr").alias("drj"),
    )
    cells = per.select(
        F.expr("drj * drj * 250000 div nj").alias("rj2q")
    )
    s = cells.groupBy().agg(
        F.sum("rj2q").alias("sum_rj2q"),
        F.count(F.lit(1)).cast("long").alias("k"),
    )
    nrow = per.groupBy().agg(F.sum("nj").alias("n"))
    ties = (
        samples.groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tc"))
        .groupBy()
        .agg(
            F.sum(F.col("tc") * F.col("tc") * F.col("tc") - F.col("tc"))
            .alias("tie_cube")
        )
    )
    x = (
        s.crossJoin(F.broadcast(nrow))
        .crossJoin(F.broadcast(ties))
        .select(
            "n",
            "k",
            "sum_rj2q",
            "tie_cube",
            (
                F.expr("12 * sum_rj2q div (n * (n + 1))")
                - 3 * (F.col("n") + 1) * F.lit(1_000_000)
            ).alias("h_ppm"),
        )
    )
    denom = F.expr("n * n * n - n - tie_cube")
    mag = F.expr(
        "abs(h_ppm) * (n * n * n - n) div (n * n * n - n - tie_cube)"
    )
    hc = F.when(
        denom > 0, F.when(F.col("h_ppm") < 0, -mag).otherwise(mag)
    ).alias("hc_ppm")
    return x.select("n", "k", "sum_rj2q", "h_ppm", "tie_cube", hc).select(
        "*", (F.col("hc_ppm") >= F.lit(crit_ppm)).alias("sig")
    )
