"""Durbin-Watson statistic (Durbin & Watson 1950) on the residuals of
the exact-rational OLS (the q265 machinery) — is the noise around a
fitted trend serially correlated? A crawl-volume or quality time
series whose OLS residuals trend together (d << 2) violates the
independence every confidence interval in the forecast lane (q308)
assumes; d >> 2 flags alternation (an oscillating scheduler).

Exactness: residuals are carried at the INTEGER scale D = n*Sxx -
Sx^2 (the OLS denominator) — r_t = D*y_t - A - B*x_t with
A = Sxx*Sy - Sx*Sxy and B = n*Sxy - Sx*Sy is exactly D times the
float residual, and the D^2 cancels between numerator and
denominator of

  d_milli = 1000 * sum (r_t - r_{t-1})^2 div sum r_t^2

so ONE integer division yields the statistic. A perfect fit
(all r = 0) surfaces NULL. Exact invariances pinned by pytest:
r is unchanged under y -> y + c (A absorbs c*D) and under
y -> y + m*x (B absorbs m*D) — intercept and slope shifts cannot
move d. The 0 <= d <= 4000 bound and the d ~ 2(1 - rho) direction
(tracking noise < 2000 < alternating noise) are gated. Long bound:
|r_t| <= D * max|residual| — n <= ~100 with small integer inputs
(the q330 bounded-slice contract).

Distributed shape: one moment aggregate broadcast back, one lag
window over the bounded time axis, one final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["durbin_watson"]


def durbin_watson(
    series: DataFrame,
    t_col: str = "t",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(t order, x regressor, y) -> ONE row (n, num, den, d_milli):
    DW on exact D-scaled OLS residuals; perfect fit -> NULL."""
    s = series.select(
        F.col(t_col).alias("t"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    m = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r = s.crossJoin(F.broadcast(m)).select(
        "t",
        "n",
        (
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.col("y")
            - (F.col("sxx") * F.col("sy") - F.col("sx") * F.col("sxy"))
            - (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            * F.col("x")
        ).alias("r"),
    )
    w = Window.orderBy("t")
    lagged = r.select(
        "n", "r", F.lag("r").over(w).alias("rp")
    )
    agg = lagged.groupBy().agg(
        F.max("n").alias("n"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("rp").isNotNull(),
                    (F.col("r") - F.col("rp")) * (F.col("r") - F.col("rp")),
                )
            ),
            F.lit(0).cast("long"),
        ).alias("num"),
        F.sum(F.col("r") * F.col("r")).alias("den"),
    )
    d = F.when(F.col("den") > 0, F.expr("1000 * num div den"))
    return agg.select("n", "num", "den", d.alias("d_milli"))
