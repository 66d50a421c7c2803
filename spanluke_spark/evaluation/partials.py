"""Partial correlation (Yule 1907) and the Koenker-studentized
Breusch-Pagan heteroscedasticity test (Breusch & Pagan 1979;
Koenker 1981) — the regression-diagnostics pair the OLS lane (q265)
and Chow (q394) leave open: is the x-y association REAL once the
confounder z is held fixed, and do the residuals fan out with x
(which silently invalidates every OLS standard error)?

Partial correlation, EXACT signed square (the q354 discipline) —
the radicals clear completely: with centered cross moments
A_a = n*Q_a - S_a^2 and C_ab = n*S_ab - S_a*S_b,

  r_xy.z^2 = (C_xy*A_z - C_xz*C_yz)^2
             / ((A_x*A_z - C_xz^2) * (A_y*A_z - C_yz^2))

one sign-split DECIMAL/HUGEINT trunc to ppm (sign of the cleared
numerator C_xy*A_z - C_xz*C_yz). Exact lanes pytest-pinned:
z unrelated and the partial collapses to plain r_xy^2; x and y
BOTH driven by z makes raw r_xy large while the partial lands near
0 (the confound-removal property this lane exists for); x == z (or
y == z) zeroes a denominator factor -> NULL.

Breusch-Pagan (Koenker form LM = n * R^2 of e^2 on x), with the
residuals cleared exactly and the SQUARED residual quantized ONCE
(the q334 cell discipline — e^2 enters as u_milli, identical in
both engines, so the auxiliary regression is integer-exact):

  E_i     = A_x*(n*y_i - S_y) - C_xy*(n*x_i - S_x)   [= n*A_x*e_i]
  u_i     = 1000 * E_i^2 div (n*A_x)^2               [e_i^2 milli]
  bp_milli = 1000 * n * C_ux^2 div (A_u * A_x)       [n * R^2_aux]

verdict at chi-square(1) 3841. Homoscedastic exact lanes: a PERFECT
linear fit makes every E_i == 0 so bp == 0 exactly; constant-
variance noise stays quiet while variance growing with x fires.
Degenerate (A_x == 0, A_u == 0 — e.g. perfect fit — or n < 4)
surfaces NULL bp with the perfect-fit case reported as 0 (stated:
no residual variation means no heteroscedasticity to find).

Long-bound contract: E_i^2 needs n * A_x * max|y| <= ~3e9 against
int64 before the cell quantization; the auxiliary clearing rides
DECIMAL(38)/HUGEINT (bounded slices, the q330 discipline).

Distributed shape: each is ONE map-side-combinable moments
aggregate (partial: 3 sums + 3 squares + 3 cross products; BP: a
second pass over the residual-decorated rows — two scans total).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["partial_correlation", "breusch_pagan"]


def partial_correlation(
    df: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    z_col: str = "z",
) -> DataFrame:
    """(x, y, z int) -> ONE row (n, num, den_x, den_y, rxy2_ppm,
    partial2_ppm): signed-square plain and partial correlations."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    z = F.col(z_col).cast("long")
    agg = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(z).alias("sz"),
        F.sum(x * x).alias("qx"),
        F.sum(y * y).alias("qy"),
        F.sum(z * z).alias("qz"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * z).alias("sxz"),
        F.sum(y * z).alias("syz"),
    )
    base = agg.select(
        "n",
        F.expr("n * qx - sx * sx").alias("ax"),
        F.expr("n * qy - sy * sy").alias("ay"),
        F.expr("n * qz - sz * sz").alias("az"),
        F.expr("n * sxy - sx * sy").alias("cxy"),
        F.expr("n * sxz - sx * sz").alias("cxz"),
        F.expr("n * syz - sy * sz").alias("cyz"),
    )
    num = F.expr(
        "cast(cxy as decimal(38,0)) * az"
        " - cast(cxz as decimal(38,0)) * cyz"
    )
    den_x = F.expr(
        "cast(ax as decimal(38,0)) * az"
        " - cast(cxz as decimal(38,0)) * cxz"
    )
    den_y = F.expr(
        "cast(ay as decimal(38,0)) * az"
        " - cast(cyz as decimal(38,0)) * cyz"
    )
    wide = base.select(
        "n",
        "ax",
        "ay",
        "cxy",
        num.alias("num"),
        den_x.alias("den_x"),
        den_y.alias("den_y"),
    )
    rxy2mag = F.expr(
        "cast(cast(cxy as decimal(38,0)) * cxy * 1000000"
        " div (cast(ax as decimal(38,0)) * ay) as long)"
    )
    pmag = F.expr(
        "cast(num * num * 1000000 div (den_x * den_y) as long)"
    )
    return wide.select(
        "n",
        F.expr("cast(num as long)").alias("num"),
        F.expr("cast(den_x as long)").alias("den_x"),
        F.expr("cast(den_y as long)").alias("den_y"),
        F.when(
            (F.col("ax") > 0) & (F.col("ay") > 0),
            F.when(F.col("cxy") < 0, -rxy2mag).otherwise(rxy2mag),
        ).alias("rxy2_ppm"),
        F.when(
            (F.col("den_x") > 0) & (F.col("den_y") > 0),
            F.when(F.col("num") < 0, -pmag).otherwise(pmag),
        ).alias("partial2_ppm"),
    )


def breusch_pagan(
    df: DataFrame, x_col: str = "x", y_col: str = "y"
) -> DataFrame:
    """(x, y int) -> ONE row (n, ax, cxy, a_u, bp_milli, sig05):
    Koenker LM = n * R^2 of the once-quantized squared residual
    on x."""
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    agg = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("qx"),
        F.sum(x * y).alias("sxy"),
    )
    base = agg.select(
        "n",
        "sx",
        "sy",
        F.expr("n * qx - sx * sx").alias("ax"),
        F.expr("n * sxy - sx * sy").alias("cxy"),
    )
    dec = df.select(x.alias("x"), y.alias("y")).crossJoin(
        F.broadcast(base)
    )
    cells = dec.select(
        "n",
        "ax",
        "cxy",
        "x",
        F.expr(
            "cast(1000 * cast(ax * (n * y - sy)"
            "       - cxy * (n * x - sx) as decimal(38,0))"
            " * (ax * (n * y - sy) - cxy * (n * x - sx))"
            " div (cast(n as decimal(38,0)) * ax * n * ax)"
            " as long)"
        ).alias("u"),
    )
    aux = cells.groupBy("n", "ax", "cxy").agg(
        F.sum("u").alias("su"),
        F.sum(F.col("u") * F.col("u")).alias("qu"),
        F.sum(F.col("u") * F.col("x")).alias("sux"),
        F.sum("x").alias("sx2"),
    )
    wide = aux.select(
        "n",
        "ax",
        "cxy",
        F.expr("n * qu - su * su").alias("a_u"),
        F.expr("n * sux - su * sx2").alias("c_ux"),
    )
    ok = (F.col("n") >= 4) & (F.col("ax") > 0)
    bp = F.expr(
        "cast(1000 * cast(n as decimal(38,0)) * c_ux * c_ux"
        " div (cast(a_u as decimal(38,0)) * ax) as long)"
    )
    return wide.select(
        "n",
        "ax",
        "cxy",
        "a_u",
        F.when(ok & (F.col("a_u") > 0), bp)
        .when(ok & (F.col("a_u") == 0), F.lit(0).cast("long"))
        .alias("bp_milli"),
        F.when(
            ok & (F.col("a_u") > 0), bp > 3841
        )
        .when(ok & (F.col("a_u") == 0), F.lit(False))
        .alias("sig05"),
    )
