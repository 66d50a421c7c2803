"""Fellegi-Sunter probabilistic record linkage (Fellegi & Sunter 1969, "A
Theory for Record Linkage" — the model behind Splink, the Census Bureau
matchers, and most production ER): each compared field contributes a
log-likelihood-ratio weight, agreement adds log2(m/u), disagreement adds
log2((1-m)/(1-u)); the summed score is thresholded into
link / possible / non-link.

m (P(agree | same entity)) and u (P(agree | different entities)) are
MODEL PARAMETERS here — estimated offline (EM over blocked samples, or
u from value-frequency tables); this operator is the SCORING/DECISION
stage, the part that runs over the 10^10 candidate pairs. Pure codegen:
per-field CASE arithmetic fused into the candidate scan, no shuffle at
all beyond what the caller's blocking already did (see
canon/canonicalize.py and evaluation/blocking.py for candidate
generation and block quality).
"""

from __future__ import annotations

from math import log2

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["fs_score", "FieldParams"]


class FieldParams:
    """m/u for one compared field; weights precomputed driver-side so the
    plan carries literal doubles."""

    def __init__(self, agree_col: str, m: float, u: float):
        if not (0.0 < u < m < 1.0):
            raise ValueError(f"need 0 < u < m < 1 for {agree_col}: m={m} u={u}")
        self.agree_col = agree_col
        self.w_agree = log2(m / u)
        self.w_disagree = log2((1.0 - m) / (1.0 - u))


def fs_score(
    pairs: DataFrame,
    fields: list[FieldParams],
    upper: float = 6.0,
    lower: float = 0.0,
) -> DataFrame:
    """pairs with boolean agreement columns -> pairs + (score, decision).

    decision: 'link' if score >= upper, 'non_link' if score < lower, else
    'possible' (the clerical-review band). A NULL agreement (field missing
    on either side) contributes 0 — the Fellegi-Sunter convention for
    unavailable comparisons. Score rounded to 1e-6 for engine portability.
    """
    score: Column = F.lit(0.0)
    for f in fields:
        a = F.col(f.agree_col)
        score = score + F.when(a.isNull(), 0.0).when(a, f.w_agree).otherwise(
            f.w_disagree
        )
    score = F.round(score, 6)
    decision = (
        F.when(score >= upper, F.lit("link"))
        .when(score < lower, F.lit("non_link"))
        .otherwise(F.lit("possible"))
    )
    return pairs.withColumn("score", score).withColumn("decision", decision)
