"""CUPED variance reduction for A/B experiments (Deng, Xu, Kohavi &
Walker 2013): adjust the experiment metric with a pre-experiment
covariate, Y_adj = Y - theta * (X - mean X) with theta =
cov(X, Y)/var(X) — the estimator that removes pre-period selection
bias and shrinks variance by the squared correlation. Completes the
repo's experimentation family: the A/B lane tests the raw lift, the
sequential SPRT lane (q327) monitors it, CUPED debiases it.

Exactness discipline (the q330 machinery): with pooled integer sums
(n, Sx, Sy, Sxx*, Sxy*, Syy* where S** = n*sum(ab) - sum(a)sum(b))
and per-arm sums (nt, nc, Sxt, Sxc, Syt, Syc):

  theta_milli    = sign-split  Sxy * 1000 div Sxx
  var_red_ppm    = two-stage   (Sxy^2 div Sxx) * 10^6 div Syy
                   (= rho^2, the CUPED variance-reduction factor;
                    Sxy^2 <= Sxx*Syy by Cauchy-Schwarz sizes stage 1)
  diff_raw_milli = sign-split  (Syt*nc - Syc*nt) * 1000 div (nt*nc)
  diff_adj       : num = (Syt*nc - Syc*nt) * Sxx
                         - Sxy * (Sxt*nc - Sxc*nt)
                   staged sign-split: (num div (nt*nc)) * 1000 div Sxx

Both stagings are trunc-toward-zero at every step (Spark div == the
replay's sign-split //), so the Python replay is bit-exact. Sxx = 0
(constant covariate) or Syy = 0 surfaces NULL for the dependent
fields; Y == X gives theta_milli == 1000, var_red_ppm == 10^6 and
diff_adj EXACTLY 0 (the numerator cancels algebraically). Overflow:
with |values| <= 10^3 and n <= 10^3, the largest product
(Syt*nc)*Sxx stays under ~10^18; callers bound the fixture.

Distributed shape: ONE aggregate over the unit table (conditional
sums fold the arm axis in — no join, no window); corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cuped"]


def cuped(
    units: DataFrame,
    treat_col: str = "treat",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(treat: boolean, x: long pre-metric, y: long metric) -> ONE
    row (n_t, n_c, sxx, sxy, syy, theta_milli, var_red_ppm,
    diff_raw_milli, diff_adj_milli)."""
    t = units.select(
        F.col(treat_col).alias("t"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    ti = F.col("t").cast("int")
    s = t.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_raw"),
        F.sum(F.col("y") * F.col("y")).alias("syy_raw"),
        F.sum(ti).cast("long").alias("n_t"),
        F.sum(F.col("x") * ti).alias("sxt"),
        F.sum(F.col("y") * ti).alias("syt"),
    )
    m = s.select(
        "n_t",
        (F.col("n") - F.col("n_t")).alias("n_c"),
        (F.col("n") * F.col("sxx_raw") - F.col("sx") * F.col("sx")).alias(
            "sxx"
        ),
        (F.col("n") * F.col("sxy_raw") - F.col("sx") * F.col("sy")).alias(
            "sxy"
        ),
        (F.col("n") * F.col("syy_raw") - F.col("sy") * F.col("sy")).alias(
            "syy"
        ),
        "sxt",
        "syt",
        (F.col("sx") - F.col("sxt")).alias("sxc"),
        (F.col("sy") - F.col("syt")).alias("syc"),
    )

    theta = F.when(
        F.col("sxx") > 0,
        F.when(
            F.col("sxy") < 0,
            -F.expr("abs(sxy) * 1000 div sxx"),
        ).otherwise(F.expr("abs(sxy) * 1000 div sxx")),
    )
    var_red = F.when(
        (F.col("sxx") > 0) & (F.col("syy") > 0),
        F.expr("(sxy * sxy div sxx) * 1000000 div syy"),
    )
    raw_num = F.col("syt") * F.col("n_c") - F.col("syc") * F.col("n_t")
    raw = F.when(
        raw_num < 0,
        -F.expr("abs(syt * n_c - syc * n_t) * 1000 div (n_t * n_c)"),
    ).otherwise(
        F.expr("abs(syt * n_c - syc * n_t) * 1000 div (n_t * n_c)")
    )
    adj_num = (
        raw_num * F.col("sxx")
        - F.col("sxy") * (F.col("sxt") * F.col("n_c") - F.col("sxc") * F.col("n_t"))
    )
    stage1 = F.when(
        adj_num < 0,
        -F.expr(
            "abs((syt * n_c - syc * n_t) * sxx"
            " - sxy * (sxt * n_c - sxc * n_t)) div (n_t * n_c)"
        ),
    ).otherwise(
        F.expr(
            "abs((syt * n_c - syc * n_t) * sxx"
            " - sxy * (sxt * n_c - sxc * n_t)) div (n_t * n_c)"
        )
    )
    x2 = m.select("*", stage1.alias("adj1"))
    adj = F.when(
        F.col("sxx") > 0,
        F.when(F.col("adj1") < 0, -F.expr("abs(adj1) * 1000 div sxx"))
        .otherwise(F.expr("abs(adj1) * 1000 div sxx")),
    )
    return x2.select(
        "n_t",
        "n_c",
        "sxx",
        "sxy",
        "syy",
        theta.alias("theta_milli"),
        var_red.alias("var_red_ppm"),
        raw.alias("diff_raw_milli"),
        adj.alias("diff_adj_milli"),
    )
