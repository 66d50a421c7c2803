"""Exception-rate likelihood-ratio backtests: Kupiec's proportion-
of-failures test (Kupiec 1995) and Christoffersen's independence
test (Christoffersen 1998) — the standard pair for auditing any
thresholded monitor that promises "this alarm fires with probability
p": does the observed exception RATE match p (Kupiec), and do the
exceptions CLUSTER (Christoffersen — a monitor that is right on
average but fires in bursts is broken in the way that matters)?
Complements the SPRT (q327, sequential) and CUSUM (q222, drift)
lanes with the retrospective batch verdicts.

Kupiec, with x exceptions in n trials and target rate p = num/den
(a RATIONAL, the caller's contract):

  LR_uc = 2 * [ x * ln((x/n)/p)  +  (n-x) * ln(((n-x)/n)/(1-p)) ]

Exactness (the q372/q393 once-quantized ln discipline): both log
arguments are integer-argument rationals — x*den/(n*num) and
(n-x)*den/(n*(den-num)) — each quantized ONCE to micro-nats; the
x == 0 / x == n boundary terms are exactly 0 (the x*ln(x) -> 0
limit, branch stated), and x/n == p EXACTLY yields LR == 0 with no
rounding at all (both arguments are the rational 1). lr_milli =
2 * (x*L1 + (n-x)*L2) div 1000, verdict by lr_milli > 3841
(chi-square(1) 0.95, the q388 quantized constant).

Christoffersen, on the lag-1 transition counts n00 n01 n10 n11
(first observation has no predecessor — dropped, stated):

  LR_ind = 2 * [ n00 ln((1-p01)/(1-pp)) + n01 ln(p01/pp)
               + n10 ln((1-p11)/(1-pp)) + n11 ln(p11/pp) ]

with p01 = n01/(n00+n01), p11 = n11/(n10+n11), pp = (n01+n11)/m —
every argument again an integer-argument rational, quantized once
per cell; zero cells contribute exactly 0 (same limit branch), and
p01 == p11 (as exact rationals) yields LR == 0 exactly. Degenerate
rows (a row of the transition table empty, or pp in {0, 1}) surface
NULL. Same chi-square(1) verdict.

Distributed shape: Kupiec is ONE aggregate; Christoffersen is one
ordered lag window + one aggregate (the q04 sessionize shape).
Long-bound contract: micro-nat cells times counts need
n * 40e6 < 2^63 — fine to n ~ 10^11.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kupiec_pof", "christoffersen"]


def _ln_cell(num_expr: str, den_expr: str):
    """round(ln(num/den) * 1e6) on an integer-argument rational."""
    return F.round(
        F.log(F.expr(num_expr) / F.expr(den_expr)) * 1_000_000
    ).cast("long")


def kupiec_pof(
    df: DataFrame,
    p_num: int,
    p_den: int,
    exceed_col: str = "exceed",
) -> DataFrame:
    """(exceed 0/1) one row per trial + target rate p_num/p_den ->
    ONE row (n, x, lr_milli, sig05)."""
    if not 0 < p_num < p_den:
        raise ValueError("target rate must satisfy 0 < p < 1")
    agg = df.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(exceed_col).cast("long")).alias("x"),
    )
    l1 = _ln_cell(f"x * {p_den}", f"n * {p_num}")
    l2 = _ln_cell(f"(n - x) * {p_den}", f"n * {p_den - p_num}")
    cells = agg.select(
        "n",
        "x",
        (
            F.when(F.col("x") > 0, F.col("x") * l1).otherwise(0)
            + F.when(
                F.col("n") - F.col("x") > 0,
                (F.col("n") - F.col("x")) * l2,
            ).otherwise(0)
        ).alias("half_micro"),
    )
    return cells.select(
        "n",
        "x",
        F.expr("2 * half_micro div 1000").alias("lr_milli"),
        (F.expr("2 * half_micro div 1000") > 3841).alias("sig05"),
    )


def christoffersen(
    df: DataFrame,
    t_col: str = "t",
    exceed_col: str = "exceed",
) -> DataFrame:
    """(t order key, exceed 0/1) -> ONE row (m, n00, n01, n10, n11,
    lr_milli, sig05); NULL verdict when any transition row is empty
    or the pooled rate is degenerate."""
    s = df.select(
        F.col(t_col).cast("long").alias("t"),
        F.col(exceed_col).cast("long").alias("e"),
    )
    w = Window.orderBy("t")
    trans = s.select(
        F.lag("e").over(w).alias("prev"), F.col("e")
    ).where(F.col("prev").isNotNull())
    agg = trans.groupBy().agg(
        F.sum(((F.col("prev") == 0) & (F.col("e") == 0)).cast("long")).alias("n00"),
        F.sum(((F.col("prev") == 0) & (F.col("e") == 1)).cast("long")).alias("n01"),
        F.sum(((F.col("prev") == 1) & (F.col("e") == 0)).cast("long")).alias("n10"),
        F.sum(((F.col("prev") == 1) & (F.col("e") == 1)).cast("long")).alias("n11"),
    ).select(
        "*",
        F.expr("n00 + n01 + n10 + n11").alias("m"),
        F.expr("n01 + n11").alias("ones"),
    )
    ok = (
        (F.expr("n00 + n01") > 0)
        & (F.expr("n10 + n11") > 0)
        & (F.col("ones") > 0)
        & (F.col("ones") < F.col("m"))
    )
    # cells: count * ln(conditional / pooled), zero counts -> 0
    c00 = F.when(
        F.col("n00") > 0,
        F.col("n00")
        * _ln_cell("n00 * m", "(n00 + n01) * (m - ones)"),
    ).otherwise(0)
    c01 = F.when(
        F.col("n01") > 0,
        F.col("n01") * _ln_cell("n01 * m", "(n00 + n01) * ones"),
    ).otherwise(0)
    c10 = F.when(
        F.col("n10") > 0,
        F.col("n10")
        * _ln_cell("n10 * m", "(n10 + n11) * (m - ones)"),
    ).otherwise(0)
    c11 = F.when(
        F.col("n11") > 0,
        F.col("n11") * _ln_cell("n11 * m", "(n10 + n11) * ones"),
    ).otherwise(0)
    base = agg.select(
        "m",
        "n00",
        "n01",
        "n10",
        "n11",
        F.when(ok, c00 + c01 + c10 + c11).alias("half_micro"),
    )
    return base.select(
        "m",
        "n00",
        "n01",
        "n10",
        "n11",
        F.when(
            F.col("half_micro").isNotNull(),
            F.expr("2 * half_micro div 1000"),
        ).alias("lr_milli"),
        F.when(
            F.col("half_micro").isNotNull(),
            F.expr("2 * half_micro div 1000") > 3841,
        ).alias("sig05"),
    )
