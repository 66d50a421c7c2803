"""Gwet's AC1 inter-rater agreement (Gwet 2008) — the
paradox-resistant alternative to Cohen's kappa (q109) in the
agreement family (Krippendorff q217, Fleiss q326, weighted kappa
q343): when both annotators label 95% of pages "not legal", kappa's
chance correction explodes (high agreement, near-zero kappa — the
Feinstein-Cicchetti paradox) while AC1's chance model
Pe = sum_q pi_q (1 - pi_q) / (Q - 1) stays calibrated.

Exactness: with n pairs, Q observed categories, agree matches, and
m_q the pooled marginal count of category q (rater A + rater B,
sum m_q = 2n), everything clears onto the common denominator
D = 4n^2(Q-1):

  Pa = agree/n,  Pe = sum_q m_q (2n - m_q) / D
  AC1 = (Pa - Pe) / (1 - Pe)
      = (agree * 4n(Q-1) - T) / (D - T),   T = sum_q m_q (2n - m_q)

— exact integers, ONE sign-split trunc to ppm. D - T =
4n^2(Q-2) + sum m_q^2 > 0 whenever Q >= 2, so the only NULL is the
single-category table (Q < 2, chance model undefined). Pinned by
pytest: perfect agreement gives exactly 10^6; consistent relabeling
of categories changes nothing; on a skewed-marginal fixture AC1
stays high while Cohen's kappa (replayed in floats) collapses — the
paradox the statistic exists to fix.

Distributed shape: one match aggregate + one pooled-marginal
aggregate (a two-branch union feeding one groupBy), one 1-row
broadcast join. Nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["gwet_ac1"]


def gwet_ac1(
    paired: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """(a label, b label) paired -> ONE row (n, q, agree, t, ac1_ppm):
    Gwet's AC1 in exact integers, one sign-split trunc; Q < 2 NULL."""
    s = paired.select(
        F.col(a_col).cast("string").alias("a"),
        F.col(b_col).cast("string").alias("b"),
    )
    base = s.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("a") == F.col("b")).cast("long")).alias("agree"),
    )
    pooled = (
        s.select(F.col("a").alias("lab"))
        .unionAll(s.select(F.col("b").alias("lab")))
        .groupBy("lab")
        .agg(F.count(F.lit(1)).cast("long").alias("mq"))
    )
    marg = pooled.crossJoin(F.broadcast(base)).groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("q"),
        F.sum(F.col("mq") * (2 * F.col("n") - F.col("mq"))).alias("t"),
    )
    x = base.crossJoin(F.broadcast(marg)).select(
        "n",
        "q",
        "agree",
        "t",
        F.expr("agree * 4 * n * (q - 1) - t").alias("num"),
        F.expr("4 * n * n * (q - 1) - t").alias("den"),
    )
    mag = F.expr("abs(num) * 1000000 div den")
    ac1 = F.when(
        (F.col("q") >= 2) & (F.col("den") > 0),
        F.when(F.col("num") < 0, -mag).otherwise(mag),
    )
    return x.select("n", "q", "agree", "t", ac1.alias("ac1_ppm"))
