"""Label-noise detection via confident learning (Northcutt, Jiang &
Chuang, JAIR 2021 — the Cleanlab algorithm): given noisy labels and
per-class predicted probabilities, estimate the CONFIDENT JOINT — the
count matrix of (given noisy label, latent true label) — and flag the
off-diagonal examples as likely mislabeled. This is the quality gate
for distant-supervision output (link/distant.py) and silver NER labels:
agreement metrics (evaluation/agreement.py) need two labelings; this
needs one labeling plus one model.

The algorithm, exactly as published (eq. 2-3 of the paper):
  t_j  = mean prob_j over examples whose NOISY label is j
         (per-class self-confidence threshold);
  an example with probs p joins cell (noisy, argmax_j {p_j : p_j >= t_j}),
  ties on the argmax break to the SMALLEST class index; examples whose
  candidate set is empty are skipped (the paper's handling).

Scale shape: thresholds are ONE hash aggregate producing C rows,
re-attached as a broadcast sorted array (crossJoin of a 1-row aggregate
— the tfidf.py/lm_score.py discipline); the candidate filter and argmax
run INSIDE the row as array higher-order functions, so probability
vectors never shuffle. The only per-example shuffle is the final joint
count aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["confident_joint", "label_issues"]


def _with_confident(
    df: DataFrame, label_col: str, probs_col: str
) -> DataFrame:
    self_conf = F.element_at(
        F.col(probs_col), (F.col(label_col) + 1).cast("int")
    )
    thr = (
        df.groupBy(F.col(label_col).alias("_cls"))
        .agg(F.avg(self_conf).alias("_t"))
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_cls"), F.col("_t")))
            ).alias("_thr_s")
        )
        .select(
            F.expr("transform(_thr_s, s -> s._t)").alias("_thr"),
            F.expr("transform(_thr_s, s -> s._cls)").alias("_cls_ix"),
        )
    )
    # classes never seen as a noisy label have no threshold: such a
    # class can never be a confident candidate (paper: its column of
    # the joint is zero), so the HOF below only scans _cls_ix.
    conf = F.expr(
        "aggregate(filter(_cls_ix,"
        f" c -> element_at({probs_col}, CAST(c + 1 AS INT))"
        "      >= element_at(_thr, CAST(array_position(_cls_ix, c) AS INT))),"
        " named_struct('p', CAST(-1.0 AS DOUBLE), 'j', CAST(-1 AS BIGINT)),"
        f" (acc, c) -> IF(element_at({probs_col}, CAST(c + 1 AS INT)) > acc.p,"
        f"   named_struct('p', element_at({probs_col}, CAST(c + 1 AS INT)),"
        "    'j', CAST(c AS BIGINT)), acc))"
    )
    return (
        df.crossJoin(F.broadcast(thr))
        .withColumn("_conf", conf)
        .filter(F.col("_conf.j") >= 0)
        .withColumn("confident_label", F.col("_conf.j"))
        .drop("_thr", "_cls_ix", "_conf", "_thr_s")
    )


def confident_joint(
    df: DataFrame,
    label_col: str = "noisy_label",
    probs_col: str = "probs",
) -> DataFrame:
    """(noisy_label, confident_label, n): the confident-joint counts.
    Off-diagonal mass estimates the label error rate per class pair."""
    return (
        _with_confident(df, label_col, probs_col)
        .groupBy(F.col(label_col).alias("noisy_label"), "confident_label")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def label_issues(
    df: DataFrame,
    label_col: str = "noisy_label",
    probs_col: str = "probs",
) -> DataFrame:
    """The flagged examples: every input row whose confident label
    disagrees with its noisy label, with both labels attached."""
    out = _with_confident(df, label_col, probs_col)
    return out.filter(F.col("confident_label") != F.col(label_col))
