"""Intraclass correlation ICC(1,1) (Fisher 1925; Shrout & Fleiss 1979
one-way random model) — inter-rater reliability for CONTINUOUS
scores, completing the agreement family (kappa q109, Krippendorff
q217, Fleiss q326, weighted kappa q343, Gwet q368 all judge
CATEGORICAL labels): when k annotators assign quality SCORES to the
same b documents, "how much of the variance is the document rather
than the rater" is exactly ICC(1) = (MSB - MSW)/(MSB + (k-1)MSW).

Exactness (EQUAL raters-per-doc k, the q358 equal-size contract):
with per-doc sums T_j, A = sum T_j^2, S = sum x^2, T = grand total,
the mean squares share the denominator bk(b-1)(k-1) and the ratio
clears to ONE sign-split trunc:

  num = (b*A - T^2)(k-1) - (k*S - A)(b-1)
  den = (k-1) * ((b*A - T^2) + (k*S - A)(b-1))
  icc_ppm = sign(num) * |num| * 10^6 div den

Unequal group sizes or a zero denominator (no variance anywhere)
surface NULL. Exact invariances pinned by pytest: adding a constant
to EVERY rating changes neither b*A - T^2 nor k*S - A; rater identity
never enters (only per-doc sums — ICC(1) is the model for
interchangeable raters); perfect within-doc agreement gives exactly
10^6; pure noise goes negative (ICC(1) < 0 is legal and meaningful:
raters disagree more within docs than between).

Distributed shape: one per-doc aggregate, one global aggregate —
no windows, no joins beyond a 1-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["icc_oneway"]


def icc_oneway(
    ratings: DataFrame,
    doc_col: str = "doc",
    value_col: str = "value",
) -> DataFrame:
    """(doc, value) one row per rating, equal raters per doc ->
    ONE row (b, k, num, den, icc_ppm)."""
    s = ratings.select(
        F.col(doc_col).alias("doc"),
        F.col(value_col).cast("long").alias("x"),
    )
    per = s.groupBy("doc").agg(
        F.count(F.lit(1)).cast("long").alias("kj"),
        F.sum("x").alias("tj"),
        F.sum(F.col("x") * F.col("x")).alias("sj"),
    )
    agg = per.groupBy().agg(
        F.count(F.lit(1)).cast("long").alias("b"),
        F.min("kj").alias("k_lo"),
        F.max("kj").alias("k_hi"),
        F.sum("tj").alias("t"),
        F.sum(F.col("tj") * F.col("tj")).alias("a"),
        F.sum("sj").alias("s"),
    )
    x = agg.select(
        "b",
        F.col("k_lo").alias("k"),
        (F.col("k_lo") == F.col("k_hi")).alias("equal_k"),
        F.expr(
            "(b * a - t * t) * (k_lo - 1) - (k_lo * s - a) * (b - 1)"
        ).alias("num"),
        F.expr(
            "(k_lo - 1) * ((b * a - t * t)"
            " + (k_lo * s - a) * (b - 1))"
        ).alias("den"),
    )
    mag = F.expr("abs(num) * 1000000 div den")
    icc = F.when(
        F.col("equal_k") & (F.col("den") > 0),
        F.when(F.col("num") < 0, -mag).otherwise(mag),
    )
    return x.select("b", "k", "num", "den", icc.alias("icc_ppm"))
