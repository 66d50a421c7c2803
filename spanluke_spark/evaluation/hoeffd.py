"""Hoeffding's D test of independence (Hoeffding 1948) — the
rank-based dependence detector that catches what the monotone lanes
cannot: Kendall (q266), Spearman (q330) and Pearson-family scores
all read ~0 on a U-shaped relationship (y = (x - med)^2), while D
fires on ANY dependence. The quality-vs-length audits of a crawl are
full of exactly such non-monotone shapes.

Classic no-ties formulation (the tabled statistic; ties are audited
and surface status='ties' with NULL D — send tied data to the
contingency lanes), with ranks R_i, S_i and the bivariate rank
Q_i = #{j != i : x_j < x_i and y_j < y_i}:

  D1 = sum Q_i (Q_i - 1)
  D2 = sum (R_i - 1)(R_i - 2)(S_i - 1)(S_i - 2)
  D3 = sum (R_i - 2)(S_i - 2) Q_i
  D  = 30 * [ (n-2)(n-3) D1 + D2 - 2(n-2) D3 ]
       / [ n(n-1)(n-2)(n-3)(n-4) ]

— an exact integer rational, one sign-split trunc to d_micro
(10^6 scale; D ranges in [-0.5, 1]). n < 5 surfaces NULL. Exact
lanes pytest-pinned: independence-structured grids land near 0, the
perfect monotone y = x gives the closed-form maximum D == 1
EXACTLY (Q_i = R_i - 1 telescopes all three sums), and the
U-shape-fires / Kendall-silent split is the property this lane
exists for.

Distributed shape: one rank window per axis (value-class based, but
the no-ties audit makes plain row_number sufficient), ONE bounded
pair join for Q_i (the q266 bounded-slice contract — D is
inherently O(n^2) in pair information), one aggregate. Long-bound:
D2 terms reach n^4 — n <= ~5000 keeps 30 * n * n^4 inside int64
(d_micro clears in DECIMAL/HUGEINT anyway for headroom).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["hoeffding_d"]


def hoeffding_d(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """(x int, y int) -> ONE row (n, d1, d2, d3, d_micro, status)."""
    s = df.select(
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    ).localCheckpoint(eager=True)
    n_row = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.countDistinct("x").alias("dx"),
        F.countDistinct("y").alias("dy"),
    )
    ranked = s.select(
        "x",
        "y",
        F.row_number().over(Window.orderBy("x")).alias("r"),
        F.row_number().over(Window.orderBy("y")).alias("s_rank"),
    )
    other = ranked.select(
        F.col("x").alias("x2"), F.col("y").alias("y2")
    )
    q = (
        ranked.join(
            other,
            (F.col("x2") < F.col("x")) & (F.col("y2") < F.col("y")),
            "left",
        )
        .groupBy("x", "y", "r", "s_rank")
        .agg(F.sum(F.col("x2").isNotNull().cast("long")).alias("qi"))
    )
    agg = q.groupBy().agg(
        F.sum(F.expr("qi * (qi - 1)")).alias("d1"),
        F.sum(
            F.expr("(r - 1) * (r - 2) * (s_rank - 1) * (s_rank - 2)")
        ).alias("d2"),
        F.sum(F.expr("(r - 2) * (s_rank - 2) * qi")).alias("d3"),
    )
    base = n_row.crossJoin(F.broadcast(agg))
    ok = (
        (F.col("n") >= 5)
        & (F.col("dx") == F.col("n"))
        & (F.col("dy") == F.col("n"))
    )
    num = F.expr(
        "cast((n - 2) as decimal(38,0)) * (n - 3) * d1 + d2"
        " - 2 * cast((n - 2) as decimal(38,0)) * d3"
    )
    mag = F.expr(
        "cast(abs(30 * (cast((n - 2) as decimal(38,0)) * (n - 3) * d1"
        "               + d2"
        "               - 2 * cast((n - 2) as decimal(38,0)) * d3))"
        " * 1000000"
        " div (cast(n as decimal(38,0)) * (n - 1) * (n - 2)"
        "      * (n - 3) * (n - 4)) as long)"
    )
    return base.select(
        "n",
        "d1",
        "d2",
        "d3",
        F.when(ok, F.when(num < 0, -mag).otherwise(mag)).alias(
            "d_micro"
        ),
        F.when(F.col("n") < 5, F.lit("too_small"))
        .when(
            (F.col("dx") < F.col("n")) | (F.col("dy") < F.col("n")),
            F.lit("ties"),
        )
        .otherwise(F.lit("ok"))
        .alias("status"),
    )
