"""Disposition/outcome extraction — what the judgment DID (appeal
allowed/dismissed, conviction set aside, matter remanded, accused
acquitted), the doc-level label a legal KG hangs off the document node.
Indian judgments state the operative order in a rigid
``<subject> is/was/stands <disposition>`` surface form, and the
OPERATIVE disposition is the LAST such statement in the text (courts
recite the history first, order last) — so ``doc_outcome`` is a
max_by-on-position aggregate, not a first-match.

Scan-side shape as all the legal lanes: one codegen regexp pass in
document order, zero Python; the doc aggregate groups by document id
with two-phase partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["outcome_mentions", "doc_outcome", "OUTCOME_RX"]

_SUBJ = r"appeal|petition|application|conviction|order|judgment|matter|accused"
_DISP = r"allowed|dismissed|set\s+aside|remanded|acquitted|convicted|quashed"
OUTCOME_RX = rf"(?i)\b({_SUBJ})\s+(?:is|was|stands)\s+({_DISP})\b"


def outcome_mentions(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (id_col, idx, subject, outcome): one row per disposition
    statement in document order; outcome normalized to snake_case
    (``set aside`` -> ``set_aside``)."""
    snip = F.posexplode(
        F.regexp_extract_all(F.col(text_col), F.lit(OUTCOME_RX), F.lit(0))
    ).alias("idx", "_m")
    m = F.col("_m")
    subject = F.lower(F.regexp_extract(m, OUTCOME_RX, 1))
    outcome = F.regexp_replace(
        F.lower(F.regexp_extract(m, OUTCOME_RX, 2)), r"\s+", "_"
    )
    return df.select(F.col(id_col), snip).select(
        id_col, "idx", subject.alias("subject"), outcome.alias("outcome")
    )


def doc_outcome(mentions: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id_col, idx, subject, outcome) -> (id_col, n_mentions, subject,
    outcome): the OPERATIVE disposition = the last statement in document
    order (max_by on position; deterministic because idx is unique per
    document)."""
    return mentions.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.max_by("subject", "idx").alias("subject"),
        F.max_by("outcome", "idx").alias("outcome"),
    )
