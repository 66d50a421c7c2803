"""Split conformal prediction (Vovk et al. 2005; Papadopoulos et al.
2002 "Inductive confidence machines"; the modern recipe as in Lei et
al. 2018 / Angelopoulos & Bates 2023 §2): distribution-free prediction
intervals for any point predictor — here the quality/length regressors
the curation stack trains (ner/train.py, textops/lm_score.py) — with a
finite-sample marginal coverage GUARANTEE >= 1 - alpha under
exchangeability, no model assumptions.

The split recipe: hold out a calibration set, compute nonconformity
scores s_i = |y_i - yhat_i|, take qhat = the k-th smallest calibration
score with k = ceil((n+1) * (1-alpha)); every test interval is
[yhat - qhat, yhat + qhat]. If k > n the interval is infinite (the
guarantee cannot be met from n calibration points; surfaced as NULL
bounds, never silently clamped).

Distributed shape (the value-class trick used across this repo, cf.
textops/abtest.py midranks): the k-th smallest is NOT found by sorting
rows — calibration scores aggregate to (score, count) value classes
(map-side combinable, at most |distinct scores| rows survive), a
cumulative count over the value order picks the smallest value whose
running count reaches k, and the one-row result broadcasts onto the
test side. No full sort, no single-partition bottleneck: 10^12
calibration rows with bounded score cardinality reduce to a tiny
relation. Integer contract: alpha is a rational (num, den), scores are
exact integers (|y - pred| on integer columns), k is computed by
ceiling integer division — bit-identical across engines.

The empirical coverage columns let a pipeline ASSERT the guarantee on
a labeled test slice each run (coverage_num/coverage_den exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["conformal_qhat", "split_conformal"]


def conformal_qhat(
    calib: DataFrame,
    score_col: str = "score",
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """One row: (n_calib, k, qhat) — qhat = k-th smallest score with
    k = ceil((n+1)(1 - alpha)); qhat NULL when k > n (infinite
    interval). Value-class selection, never a row sort."""
    classes = calib.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = classes.withColumn("cum", F.sum("c").over(w))
    stats = classes.agg(F.sum("c").alias("n_calib"))
    # k = ceil((n+1) * (den-num) / den), integer
    stats = stats.withColumn(
        "k",
        F.floor(
            (
                (F.col("n_calib") + 1) * (alpha_den - alpha_num)
                + (alpha_den - 1)
            )
            / alpha_den
        ).cast("long"),
    )
    qhat = (
        ranked.join(F.broadcast(stats), F.col("cum") >= F.col("k"))
        .groupBy("n_calib", "k")
        .agg(F.min("s").alias("qhat"))
    )
    # k > n: no class reaches k — re-attach stats so the row survives
    # with NULL qhat instead of vanishing (broadcast the RIGHT side:
    # Spark can't broadcast-build the left of a left outer join)
    return stats.join(F.broadcast(qhat), ["n_calib", "k"], "left")


def split_conformal(
    df: DataFrame,
    pred_col: str,
    y_col: str,
    calib_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal intervals for the non-calibration rows of df.

    df carries integer prediction + label columns and a boolean
    calib_col marking the calibration slice. Returns the test rows
    with (lo, hi, covered) plus the one-row calibration summary
    (n_calib, k, qhat) and exact empirical coverage
    (coverage_num/coverage_den) broadcast onto every row."""
    score = F.abs(F.col(y_col) - F.col(pred_col))
    calib = df.where(F.col(calib_col)).select(score.alias("score"))
    q = conformal_qhat(calib, "score", alpha_num, alpha_den)
    test = df.where(~F.col(calib_col))
    out = test.crossJoin(F.broadcast(q))
    out = out.withColumn("lo", F.col(pred_col) - F.col("qhat")).withColumn(
        "hi", F.col(pred_col) + F.col("qhat")
    )
    covered = F.when(
        F.col("qhat").isNull(), F.lit(True)  # infinite interval covers
    ).otherwise(F.col(y_col).between(F.col("lo"), F.col("hi")))
    out = out.withColumn("covered", covered)
    # exact coverage as a 1-row broadcast aggregate (an unpartitioned
    # window would funnel every test row through one partition)
    cov = out.agg(
        F.sum(F.col("covered").cast("long")).alias("coverage_num"),
        F.count(F.lit(1)).alias("coverage_den"),
    )
    return out.crossJoin(F.broadcast(cov))
