"""Probability-calibration audit for quality classifiers — reliability
diagram bins + Expected Calibration Error (Naeini et al. 2015; the
standard check before a model's scores are used as admission
probabilities in a curation mixture, where an over-confident quality
score silently skews the whole corpus).

Equal-width score bins; per bin the mean predicted score vs the observed
positive rate; ECE = Σ (n_b / N) · |mean_score_b − pos_rate_b|. Two
map-side-combinable aggs and a 1-row broadcast total — no windows, no
sorting; at 10^12 scored documents the shuffle carries n_bins rows per
task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["reliability_bins", "expected_calibration_error"]


def reliability_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """(score in [0,1], label boolean) -> (bin, n, avg_score, pos_rate):
    one row per non-empty equal-width bin (score 1.0 folds into the top
    bin)."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        scored.withColumn("bin", b)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg(score_col), 6).alias("avg_score"),
            F.round(F.avg(F.col(label_col).cast("double")), 6).alias("pos_rate"),
        )
    )


def expected_calibration_error(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """-> 1 row (n_total, ece): weighted mean |avg_score - pos_rate|
    over the reliability bins (computed on ROUNDED bin stats so the
    number is engine-portable)."""
    bins = reliability_bins(
        scored, n_bins=n_bins, score_col=score_col, label_col=label_col
    )
    return bins.agg(
        F.sum("n").alias("n_total"),
        F.round(
            F.sum(F.col("n") * F.abs(F.col("avg_score") - F.col("pos_rate")))
            / F.sum("n"),
            6,
        ).alias("ece"),
    )
