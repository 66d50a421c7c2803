"""Classifier operating-point sweep: per-threshold F1 and Youden's J
(Youden 1950) over integer scores — which cutoff should the quality /
spam / legal-page classifier ship with? The ROC lane (q296) prices
the ranking as a whole; deployment needs ONE threshold, and the two
standard picks are max-F1 (imbalance-aware) and max-J = TPR - FPR
(prevalence-free).

Exactness: one (score) aggregate + one descending cumulative window
give TP(t)/FP(t) for EVERY distinct threshold t (predict positive iff
score >= t) — the full curve in one pass, no per-threshold jobs. Per
threshold, once-quantized cells:

  f1_ppm   = 2*TP * 10^6 div (2*TP + FP + FN)      (exact rational,
                                                    one trunc)
  j_milli  = TP*1000 div P  -  FP*1000 div N       (two once-
                                                    quantized terms)

P = 0 or N = 0 surfaces NULL J (F1 stays defined — its denominator
is positive on any nonempty slice). The best-F1 row is pinned
deterministically by (f1_ppm desc, t asc) row_number — the lowest
winning threshold on ties. Closed forms pinned by pytest: perfect
separation reaches f1 = 10^6 and j = 1000 exactly at the right
cutoff; TP/FP monotonicity along the sweep; J == 0 at the all-in
threshold (TP = P, FP = N).

Distributed shape: one groupBy(score), one global window over the
bounded distinct-score axis, one 1-row totals broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["threshold_sweep"]


def threshold_sweep(
    scored: DataFrame,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """(score integer, label bool) -> one row per distinct score t:
    (t, tp, fp, f1_ppm, j_milli, is_best_f1)."""
    s = scored.select(
        F.col(score_col).cast("long").alias("t"),
        F.col(label_col).cast("boolean").alias("y"),
    )
    per = s.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(F.col("y").cast("long")).alias("pos"),
    )
    tot = per.groupBy().agg(
        F.sum("pos").alias("p"),
        F.sum(F.col("cnt") - F.col("pos")).alias("nn"),
    )
    w = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per.select(
        "t",
        F.sum("pos").over(w).alias("tp"),
        F.sum(F.col("cnt") - F.col("pos")).over(w).alias("fp"),
    )
    x = cum.crossJoin(F.broadcast(tot)).select(
        "t",
        "tp",
        "fp",
        F.expr("2 * tp * 1000000 div (2 * tp + fp + (p - tp))").alias(
            "f1_ppm"
        ),
        F.when(
            (F.col("p") > 0) & (F.col("nn") > 0),
            F.expr("tp * 1000 div p - fp * 1000 div nn"),
        ).alias("j_milli"),
    )
    wbest = Window.orderBy(F.col("f1_ppm").desc(), F.col("t").asc())
    return x.select(
        "*", (F.row_number().over(wbest) == 1).alias("is_best_f1")
    )
