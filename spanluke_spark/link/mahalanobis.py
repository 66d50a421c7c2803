"""Bivariate Mahalanobis outlier audit (Mahalanobis 1936) — the
PARAMETRIC companion to the density-based LOF lane (q277): when two
quality signals are correlated (length vs link count), axis-aligned
z-score fences pass points that are flagrant outliers of the joint
ellipse; d^2 = (x - mu)^T Sigma^{-1} (x - mu) is the right fence,
and in 2-D the inverse has a closed adjugate form that keeps the
whole computation in exact integers.

Exactness discipline: with centered-times-n residuals u = n*x - Sx,
v = n*y - Sy and scatter terms Sab = n*sum(ab) - Sa*Sb (= n^2 cov),

  d^2 = (Syy*u^2 - 2*Sxy*u*v + Sxx*v^2) / det,  det = Sxx*Syy - Sxy^2

— one exact rational per point (the n^2 scalings cancel
algebraically). num >= 0 by positive-semidefiniteness;
d2_milli = num * 1000 div det is one truncating division, and the
outlier flag is the same division gated against a caller-supplied
published chi-squared df=2 critical value (5991 milli = 5.991).
Degenerate scatter (det <= 0: a constant or perfectly collinear
pair) surfaces NULL. Overflow: num <= 3 * max(|u|,|v|)^2 *
max(S**) — with |features| <= 2^5 and n <= 10^3 slices everything
stays under ~10^16; callers bound the fixture like the LOF lane.

Distributed shape: ONE moment aggregate broadcast back onto the
point table — no join by key, no window; per-point work is a few
multiplications, corpus-linear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["mahalanobis2"]


def mahalanobis2(
    pts: DataFrame,
    crit_milli: int = 5991,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """(id, x: long, y: long) -> per point (id, num, det, d2_milli,
    outlier)."""
    p = pts.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("long").alias("x"),
        F.col(y_col).cast("long").alias("y"),
    )
    m = p.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx_raw"),
        F.sum(F.col("x") * F.col("y")).alias("sxy_raw"),
        F.sum(F.col("y") * F.col("y")).alias("syy_raw"),
    ).select(
        "n",
        "sx",
        "sy",
        (F.col("n") * F.col("sxx_raw") - F.col("sx") * F.col("sx")).alias(
            "sxx"
        ),
        (F.col("n") * F.col("sxy_raw") - F.col("sx") * F.col("sy")).alias(
            "sxy"
        ),
        (F.col("n") * F.col("syy_raw") - F.col("sy") * F.col("sy")).alias(
            "syy"
        ),
    )
    x = p.crossJoin(F.broadcast(m))
    u = F.col("n") * F.col("x") - F.col("sx")
    v = F.col("n") * F.col("y") - F.col("sy")
    num = (
        F.col("syy") * u * u
        - 2 * F.col("sxy") * u * v
        + F.col("sxx") * v * v
    )
    det = F.col("sxx") * F.col("syy") - F.col("sxy") * F.col("sxy")
    scored = x.select(
        "id", num.alias("num"), det.alias("det")
    )
    d2 = F.when(F.col("det") > 0, F.expr("num * 1000 div det"))
    return scored.select("id", "num", "det", d2.alias("d2_milli")).select(
        "*", (F.col("d2_milli") >= F.lit(crit_milli)).alias("outlier")
    )
