"""Exact ROC-AUC as a rank statistic — the binary-classifier member of
the evaluation family (nDCG q209, MAP q257, calibration q148,
Krippendorff q217, B-cubed q274). At crawl scale the classifier is a
quality / spam / language gate scored over 10^12 pages; AUC is the
threshold-free audit number for "does the gate order good above bad?".

AUC = P(score_pos > score_neg) + 0.5 * P(score_pos = score_neg)
    = (wins + ties/2) / (n_pos * n_neg)

carried EXACTLY as the integer pair (auc_num2, auc_den2) with
num2 = 2*wins + tie_pairs and den2 = 2 * n_pos * n_neg, plus the
trunc-ppm projection num2 * 10^6 div den2 — no floats, replayable
bit-identically in SQL.

Distributed shape: NO pair join. Group by (group, score) once —
combinable partial aggregate, the only shuffle proportional to the
number of DISTINCT scores per group (bounded by the score
quantization, not the corpus) — then one cumulative window per group
ordered by score gives every positive its count of strictly-lower
negatives:

  wins      = sum_s pos_at(s) * cum_neg_below(s)
  tie_pairs = sum_s pos_at(s) * neg_at(s)

This is the Mann-Whitney U identity (the same statistic q246 tests for
location shift, here normalized as a classifier metric).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["roc_auc"]


def roc_auc(
    df: DataFrame,
    group_col: str = "grp",
    label_col: str = "label",
    score_col: str = "score",
) -> DataFrame:
    """(group, label in {0,1}, score) -> per group:
    (grp, n_pos, n_neg, auc_num2, auc_den2, auc_ppm). Scores must be
    exactly comparable (integers or already-quantized); auc_ppm is
    NULL when a group lacks one of the classes (den2 = 0)."""
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(label_col).cast("long").alias("y"),
        F.col(score_col).alias("s"),
    )
    per_score = base.groupBy("grp", "s").agg(
        F.sum("y").alias("pos_s"),
        F.sum(1 - F.col("y")).alias("neg_s"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_score = per_score.withColumn(
        "cum_neg_below", F.coalesce(F.sum("neg_s").over(w), F.lit(0))
    )
    out = per_score.groupBy("grp").agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum("neg_s").cast("long").alias("n_neg"),
        (
            2 * F.sum(F.col("pos_s") * F.col("cum_neg_below"))
            + F.sum(F.col("pos_s") * F.col("neg_s"))
        ).cast("long").alias("auc_num2"),
    )
    out = out.withColumn(
        "auc_den2", (2 * F.col("n_pos") * F.col("n_neg")).cast("long")
    )
    return out.withColumn(
        "auc_ppm",
        F.when(
            F.col("auc_den2") > 0,
            F.expr("(auc_num2 * 1000000) div auc_den2"),
        ),
    )
