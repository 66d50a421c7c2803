"""Goodman-Kruskal association family (Goodman & Kruskal 1954):
gamma + Somers' D for ordinal pairs, and lambda for nominal
prediction — the PRE ("proportional reduction in error") measures
that sit between Kendall tau-b (q266, symmetric, sqrt denominator)
and Cramér's V (q375, magnitude-only).

Web-scale use: "does crawl priority actually predict fetch quality?"
is a Somers' D(y|x) question (asymmetric: x is the predictor);
"knowing the source bucket, how much better do we guess the language
mode?" is lambda. Both come up constantly when auditing heuristic
crawl signals against ground truth.

Exactness: on (x, y) VALUE CLASSES (the kendall_tau_b discipline —
rows collapse to distinct value pairs first, so the quadratic term is
in class count, never corpus size):

  C, D            from the ordered class-pair join (exact products)
  T_xy            = sum_c c(c-1)/2            (ties on both)
  T_x-only        = sum_x t(t-1)/2 - T_xy     (tied x, differing y)
  T_y-only        = sum_y t(t-1)/2 - T_xy
  conservation    C + D + T_x + T_y + T_xy == n(n-1)/2   (pytest)

  gamma      = (C - D) / (C + D)
  D(y|x)     = (C - D) / (C + D + T_y-only)
  D(x|y)     = (C - D) / (C + D + T_x-only)

each an exact integer rational before ONE sign-split truncating ppm
division (Spark div == DuckDB // after the sign split); C + D == 0
(all pairs tied) surfaces NULL. Identity pinned in pytest:
tau_b^2 == D(y|x) * D(x|y) (floats), and gamma == tau-a when no ties.

lambda (nominal): with contingency cells n_xc and column marginals,

  lambda(y|x) = (sum_x max_c n_xc - max_c n_.c) / (n - max_c n_.c)
  lambda(x|y) = (sum_y max_r n_rc - max_r n_r.) / (n - max_r n_r.)
  lambda_sym  = (both numerators) / (2n - both modal marginals)

all exact integers, one trunc each; a constant y (modal column == n)
surfaces NULL for lambda(y|x) — guessing the mode is already perfect.

Distributed shape: ONE groupBy to classes (map-side combinable),
marginal aggs over the class table (tiny), and for the ordinal family
the class-pair self-join on the localCheckpointed class table.
Contract, stated: signals must be discretized upstream; class count
is the caller's scale knob (dedup's brute-lane contract).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["gamma_somers", "gk_lambda"]


def _classes(df: DataFrame, x: Column, y: Column) -> DataFrame:
    return (
        df.select(x.cast("long").alias("x"), y.cast("long").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )


def gamma_somers(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """-> ONE row (n, concordant, discordant, t_x, t_y, t_xy,
    gamma_ppm, somers_yx_ppm, somers_xy_ppm): Goodman-Kruskal gamma
    and both asymmetric Somers' D, exact pair counts, one sign-split
    trunc each; NULL when every pair is tied (C + D == 0)."""
    classes = _classes(df, x, y)
    a, b = classes.alias("a"), classes.alias("b")
    ax, ay, ac = F.col("a.x"), F.col("a.y"), F.col("a.c")
    bx, by, bc = F.col("b.x"), F.col("b.y"), F.col("b.c")
    pairs = a.join(
        b, (ax < bx) | ((ax == bx) & (ay < by)), "inner"
    ).select(
        (ac * bc).alias("cc"),
        F.signum(((ax - bx) * (ay - by)).cast("double"))
        .cast("int")
        .alias("sgn"),
    )
    cross = pairs.agg(
        F.coalesce(
            F.sum(F.when(F.col("sgn") == 1, F.col("cc"))), F.lit(0)
        )
        .cast("long")
        .alias("concordant"),
        F.coalesce(
            F.sum(F.when(F.col("sgn") == -1, F.col("cc"))), F.lit(0)
        )
        .cast("long")
        .alias("discordant"),
    )
    margx = (
        classes.groupBy("x")
        .agg(F.sum("c").alias("t"))
        .agg(F.expr("sum(t * (t - 1)) div 2").alias("n1"))
    )
    margy = (
        classes.groupBy("y")
        .agg(F.sum("c").alias("t"))
        .agg(F.expr("sum(t * (t - 1)) div 2").alias("n2"))
    )
    both = classes.agg(
        F.sum("c").cast("long").alias("n"),
        F.expr("sum(c * (c - 1)) div 2").alias("t_xy"),
    )
    base = (
        cross.crossJoin(F.broadcast(margx))
        .crossJoin(F.broadcast(margy))
        .crossJoin(F.broadcast(both))
        .select(
            F.col("n"),
            F.col("concordant"),
            F.col("discordant"),
            (F.col("n1") - F.col("t_xy")).alias("t_x"),
            (F.col("n2") - F.col("t_xy")).alias("t_y"),
            F.col("t_xy"),
        )
    )

    def ratio(extra_den: str, alias: str):
        num = F.col("concordant") - F.col("discordant")
        mag = F.expr(
            "abs(concordant - discordant) * 1000000"
            f" div (concordant + discordant{extra_den})"
        )
        return F.when(
            F.col("concordant") + F.col("discordant") > 0,
            F.when(num < 0, -mag).otherwise(mag),
        ).alias(alias)

    return base.select(
        "n",
        "concordant",
        "discordant",
        "t_x",
        "t_y",
        "t_xy",
        ratio("", "gamma_ppm"),
        ratio(" + t_y", "somers_yx_ppm"),
        ratio(" + t_x", "somers_xy_ppm"),
    )


def gk_lambda(df: DataFrame, x: Column, y: Column) -> DataFrame:
    """-> ONE row (n, sum_rowmax, sum_colmax, mode_row, mode_col,
    lambda_yx_ppm, lambda_xy_ppm, lambda_sym_ppm): Goodman-Kruskal
    lambda in both directions plus the symmetric form, exact
    integers, one trunc each; NULL when the relevant marginal is
    already constant (nothing left to predict)."""
    classes = _classes(df, x, y)
    rowmax = (
        classes.groupBy("x")
        .agg(F.max("c").alias("m"))
        .agg(F.sum("m").cast("long").alias("sum_rowmax"))
    )
    colmax = (
        classes.groupBy("y")
        .agg(F.max("c").alias("m"))
        .agg(F.sum("m").cast("long").alias("sum_colmax"))
    )
    mode_row = (
        classes.groupBy("x")
        .agg(F.sum("c").alias("t"))
        .agg(F.max("t").cast("long").alias("mode_row"))
    )
    mode_col = (
        classes.groupBy("y")
        .agg(F.sum("c").alias("t"))
        .agg(F.max("t").cast("long").alias("mode_col"))
    )
    tot = classes.agg(F.sum("c").cast("long").alias("n"))
    base = (
        tot.crossJoin(F.broadcast(rowmax))
        .crossJoin(F.broadcast(colmax))
        .crossJoin(F.broadcast(mode_row))
        .crossJoin(F.broadcast(mode_col))
    )
    return base.select(
        "n",
        "sum_rowmax",
        "sum_colmax",
        "mode_row",
        "mode_col",
        F.when(
            F.col("n") > F.col("mode_col"),
            F.expr(
                "(sum_rowmax - mode_col) * 1000000 div (n - mode_col)"
            ),
        ).alias("lambda_yx_ppm"),
        F.when(
            F.col("n") > F.col("mode_row"),
            F.expr(
                "(sum_colmax - mode_row) * 1000000 div (n - mode_row)"
            ),
        ).alias("lambda_xy_ppm"),
        F.when(
            2 * F.col("n") > F.col("mode_row") + F.col("mode_col"),
            F.expr(
                "(sum_rowmax - mode_col + sum_colmax - mode_row)"
                " * 1000000 div (2 * n - mode_row - mode_col)"
            ),
        ).alias("lambda_sym_ppm"),
    )
