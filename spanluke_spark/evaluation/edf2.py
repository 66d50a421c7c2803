"""Two-sample EDF tests: Anderson-Darling (Darling 1957; Pettitt
1976 two-sample form) and Cramer-von Mises (Anderson 1962) — the
whole-distribution comparisons that complete the KS lane (q267): KS
reads the single worst CDF gap, CvM integrates the squared gap, AD
re-weights it by 1/(F(1-F)) so TAIL disagreements — exactly where
crawl-quality distributions differ — actually count.

Both ride the pooled order positions j = 1..N with M_j = #sample-0
values among the first j (one rank window + one cumulative window;
NO-TIES contract audited to status='ties' — the tie-adjusted
Scholz-Stephens variant is a different statistic, not a silent
fallback). With n = |sample 0|, m = N - n:

  CvM is EXACT in one rational — the (F1-F2)^2 denominators cancel:

    t_milli = 1000 * sum_{j=1}^{N} (M_j*N - j*n)^2 div (n*m*N^2)

  verdict at the asymptotic 5% point 0.461 (quantized, stated).

  AD needs a per-position division, so each term is a once-quantized
  micro cell (the q334 discipline):

    cell_j  = 10^6 * (M_j*N - j*n)^2 div (j * (N - j)),  j < N
    a2_milli = sum(cell) div (1000 * n * m)

  verdict at the asymptotic 5% point 2.492 (Pettitt 1976 Table 1,
  quantized, stated).

Exact lanes pytest-pinned: interleaved identical samples drive both
to their minima; a disjoint split drives CvM to its closed-form
maximum region and AD far past critical; identical-multiset inputs
violate no-ties and surface status='ties' (the audit IS the answer
there — pooled EDF tests need a tie policy, and this engine
declares one instead of guessing).

Distributed shape: one global rank window over the bounded slice
(the q386 contract) + one aggregate each; the two tests share the
position frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["anderson_darling_2s", "cramer_von_mises_2s"]


def _positions(df: DataFrame, group_col: str, x_col: str):
    s = df.select(
        (F.col(group_col) == 0).alias("is_a"),
        F.col(x_col).cast("long").alias("x"),
    )
    w = Window.orderBy("x", "is_a")
    pos = s.select(
        "is_a",
        "x",
        F.row_number().over(w).alias("j"),
    )
    wj = Window.orderBy("j").rowsBetween(Window.unboundedPreceding, 0)
    marked = pos.select(
        "j",
        "x",
        F.sum(F.col("is_a").cast("long")).over(wj).alias("mj"),
    )
    meta = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum(F.col("is_a").cast("long")).alias("n"),
        F.countDistinct("x").alias("dx"),
    )
    return marked.crossJoin(F.broadcast(meta))


def cramer_von_mises_2s(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int, no ties) -> ONE row (n, m, t_milli, sig05,
    status)."""
    rows = _positions(df, group_col, x_col)
    agg = rows.groupBy("nn", "n", "dx").agg(
        F.sum(
            F.expr(
                "(mj * nn - j * n) * (mj * nn - j * n)"
            )
        ).alias("ssq")
    )
    ok = (
        (F.col("dx") == F.col("nn"))
        & (F.col("n") >= 1)
        & (F.col("nn") - F.col("n") >= 1)
    )
    t = F.expr("1000 * ssq div (n * (nn - n) * nn * nn)")
    return agg.select(
        F.col("n"),
        (F.col("nn") - F.col("n")).alias("m"),
        F.when(ok, t).alias("t_milli"),
        F.when(ok, t > 461).alias("sig05"),
        F.when(F.col("dx") < F.col("nn"), F.lit("ties"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )


def anderson_darling_2s(
    df: DataFrame, group_col: str = "grp", x_col: str = "x"
) -> DataFrame:
    """(grp 0/1, x int, no ties) -> ONE row (n, m, cell_sum,
    a2_milli, sig05, status)."""
    rows = _positions(df, group_col, x_col)
    cells = rows.where(F.col("j") < F.col("nn")).select(
        "nn",
        "n",
        "dx",
        F.expr(
            "1000000 * (mj * nn - j * n) * (mj * nn - j * n)"
            " div (j * (nn - j))"
        ).alias("cell"),
    )
    agg = cells.groupBy("nn", "n", "dx").agg(
        F.sum("cell").alias("cell_sum")
    )
    ok = (
        (F.col("dx") == F.col("nn"))
        & (F.col("n") >= 1)
        & (F.col("nn") - F.col("n") >= 1)
    )
    a2 = F.expr("cell_sum div (1000 * n * (nn - n))")
    return agg.select(
        F.col("n"),
        (F.col("nn") - F.col("n")).alias("m"),
        "cell_sum",
        F.when(ok, a2).alias("a2_milli"),
        F.when(ok, a2 > 2492).alias("sig05"),
        F.when(F.col("dx") < F.col("nn"), F.lit("ties"))
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
