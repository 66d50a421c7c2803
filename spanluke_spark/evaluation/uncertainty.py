"""Theil's uncertainty coefficient U (Theil 1970) — the DIRECTIONAL
entropy-based association: U(y|x) = I(x;y) / H(y) is the fraction of
y's uncertainty that knowing x removes. Completes the categorical-
association family: NMI (q331) is its symmetric cousin, Cramér's V
(q375) the chi-square one, lambda (q385) the modal-PRE one — U is
what you reach for when the question is asymmetric ("how much does
the source bucket TELL US about the language?") and the answer must
be entropy-calibrated, not mode-calibrated.

Exactness (the q372/q334 once-quantized ln discipline): every
logarithm is quantized ONCE, on the SAME integer-argument rational
in both engines, to micro-nats L = round(ln(arg) * 10^6); counts
then ride exact integer products. Scaling I and H by n (which
cancels in the ratio):

  i_cells = sum_xy n_xy * round(ln(n_xy * n / (n_x * n_y)) * 1e6)
  h_y     = sum_y  n_y  * round(ln(n / n_y) * 1e6)
  h_x     = sum_x  n_x  * round(ln(n / n_x) * 1e6)

  u_yx_ppm  = i_cells * 10^6 div h_y          (NULL when h_y == 0)
  u_xy_ppm  = i_cells * 10^6 div h_x
  u_sym_ppm = 2 * i_cells * 10^6 div (h_x + h_y)

Exact lanes (pytest-pinned): y == f(x) makes every i-cell argument
n/n_y — the SAME rational H(y)'s cells quantize — so u_yx == 10^6
EXACTLY, quantization and all; an exact product structure makes every
cell argument 1, so U == 0 exactly; constant y surfaces NULL (its
uncertainty is already zero). i_cells can dip microscopically
negative from ln rounding on near-independent tables; it is clamped
at 0 (stated — U is a ratio of nonnegatives).

Long-bound contract: |cells| <= n * 15e6 (ln <= ~15 covers n up to
~10^6 per slice) keeps i_cells * 10^6 well under 2^63.

Distributed shape: ONE groupBy to cells, two marginal aggs over the
cell table (tiny), one broadcast totals row, three combinable sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["uncertainty_coefficient"]


def uncertainty_coefficient(
    df: DataFrame, x: Column, y: Column
) -> DataFrame:
    """-> ONE row (n, n_cells, i_cells, h_x, h_y, u_yx_ppm,
    u_xy_ppm, u_sym_ppm)."""
    cells = (
        df.select(x.cast("long").alias("x"), y.cast("long").alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    margx = cells.groupBy("x").agg(F.sum("c").alias("nx"))
    margy = cells.groupBy("y").agg(F.sum("c").alias("ny"))
    tot = cells.groupBy().agg(F.sum("c").alias("n"))

    def ent(marg: DataFrame, cnt: str, alias: str) -> DataFrame:
        ln = F.round(
            F.log(F.col("n") / F.col(cnt)) * 1_000_000
        ).cast("long")
        return (
            marg.crossJoin(F.broadcast(tot))
            .select((F.col(cnt) * ln).alias("cell"))
            .groupBy()
            .agg(F.coalesce(F.sum("cell"), F.lit(0)).alias(alias))
        )
    hx = ent(margx, "nx", "h_x")
    hy = ent(margy, "ny", "h_y")
    lni = F.round(
        F.log(
            (F.col("c") * F.col("n")) / (F.col("nx") * F.col("ny"))
        )
        * 1_000_000
    ).cast("long")
    icells = (
        cells.join(F.broadcast(margx), "x")
        .join(F.broadcast(margy), "y")
        .crossJoin(F.broadcast(tot))
        .select("n", (F.col("c") * lni).alias("cell"))
        .groupBy("n")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.greatest(F.sum("cell"), F.lit(0).cast("long")).alias(
                "i_cells"
            ),
        )
    )
    base = icells.crossJoin(F.broadcast(hx)).crossJoin(F.broadcast(hy))
    return base.select(
        "n",
        "n_cells",
        "i_cells",
        "h_x",
        "h_y",
        F.when(
            F.col("h_y") > 0, F.expr("i_cells * 1000000 div h_y")
        ).alias("u_yx_ppm"),
        F.when(
            F.col("h_x") > 0, F.expr("i_cells * 1000000 div h_x")
        ).alias("u_xy_ppm"),
        F.when(
            F.col("h_x") + F.col("h_y") > 0,
            F.expr("2 * i_cells * 1000000 div (h_x + h_y)"),
        ).alias("u_sym_ppm"),
    )
