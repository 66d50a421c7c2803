"""Power-law tail MLE (Clauset, Shalizi & Newman 2009 eq. 3.1) —
the principled exponent estimate for heavy-tailed crawl
distributions (in-degree, host size, token frequency), where the
q102 Zipf log-log regression is the descriptive fit the CSN paper
warns about:

  alpha_hat = 1 + n / sum_i ln(x_i / xmin),   x_i >= xmin
  se(alpha) = (alpha_hat - 1) / sqrt(n)

Exactness (the q372/q393 once-quantized ln discipline): each log is
quantized ONCE in micro-nats on the integer-argument rational
x_i/xmin — L_i = round(ln(x_i/xmin) * 10^6) — then

  alpha_milli = 1000 + 1000 * n * 10^6 div sum(L)
  se2_micro   = (alpha_milli - 1000)^2 div n     [squared SE, x1e6]

one truncating division each. A tail where every x == xmin
(sum L == 0) surfaces NULL — the MLE diverges there. EXACT scaling
lane pytest-pinned: x -> c*x with xmin -> c*xmin leaves every
quantized cell — and therefore alpha_milli BIT-EXACTLY — unchanged,
because the rationals x/xmin are identical.

Long-bound contract: 1000 * n * 10^6 needs n <= ~9e9 tail rows; the
cells are bounded by ln of the dynamic range (~40e6 micro-nats for
exabyte ranges), so sum(L) <= n * 4e7 is the binding bound — fine to
n ~ 2e8 per slice (bounded-slice discipline for larger tails).

Distributed shape: one filter + one aggregate. The caller picks
xmin (CSN's KS-scan over candidate xmin values composes as a loop of
these one-aggregate calls over the bounded candidate set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["powerlaw_alpha"]


def powerlaw_alpha(
    df: DataFrame, xmin: int, x_col: str = "x"
) -> DataFrame:
    """(x integer > 0) + xmin -> ONE row (xmin, n_tail, sum_l,
    alpha_milli, se2_micro)."""
    if xmin < 1:
        raise ValueError("xmin must be >= 1")
    x = F.col(x_col).cast("long")
    tail = df.select(x.alias("x")).where(F.col("x") >= xmin)
    cells = tail.select(
        F.round(F.log(F.col("x") / F.lit(xmin)) * 1_000_000)
        .cast("long")
        .alias("l")
    )
    agg = cells.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.coalesce(F.sum("l"), F.lit(0).cast("long")).alias("sum_l"),
    )
    alpha = F.expr("1000 + 1000 * n_tail * 1000000 div sum_l")
    return agg.select(
        F.lit(xmin).cast("long").alias("xmin"),
        "n_tail",
        "sum_l",
        F.when((F.col("n_tail") > 0) & (F.col("sum_l") > 0), alpha).alias(
            "alpha_milli"
        ),
        F.when(
            (F.col("n_tail") > 0) & (F.col("sum_l") > 0),
            F.expr(
                "(1000 * n_tail * 1000000 div sum_l)"
                " * (1000 * n_tail * 1000000 div sum_l) div n_tail"
            ),
        ).alias("se2_micro"),
    )
