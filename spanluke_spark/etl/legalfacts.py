"""Unified legal-fact extraction: run every legal surface lane — statute
citations, case-name precedents, Justice mentions, in-text dates, quote
attributions — over a judgment/page stream and emit ONE normalized
(doc_id, subj, pred, obj, lane) fact relation, the legal analogue of
etl/webfacts.py (which unions the three Web Data Commons markup lanes).

This is the KG-construction join point for the reference's LegalNER
label set (`/root/reference/legal_ner/` data config): STATUTE/PROVISION
become ``charged_under`` edges, PRECEDENT becomes ``cites_case``, JUDGE
becomes ``heard_by``, dates become ``dated`` validity anchors, and quote
attributions carry speaker-as-subject ``stated`` claims with the
document as provenance.

Scale shape: every lane is a pure-codegen scan-side extraction (see the
lane modules); the union is plan concatenation, not a shuffle, and the
only exchange in an extract->dedupe job is the closing ``distinct()``
on the already-tiny fact relation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dates import extract_dates
from .judges import judge_mentions
from .quotes import quote_attributions
from .statutes import statute_citations
from ..graph.citations import case_mentions

__all__ = ["legal_facts", "legal_facts_extended"]


def legal_facts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """-> (doc_id, subj, pred, obj, lane), distinct. The document node
    ``doc:<id>`` is the subject everywhere except the quote lane, where
    the SPEAKER is the subject (a quote is the speaker's claim; the
    doc_id column carries provenance)."""
    doc_node = F.concat(F.lit("doc:"), F.col(id_col).cast("string"))

    st = statute_citations(docs, text_col, id_col).select(
        F.col(id_col),
        doc_node.alias("subj"),
        F.lit("charged_under").alias("pred"),
        F.concat(
            F.col("statute"),
            F.when(F.col("kind") == "article", F.lit(" art.")).otherwise(
                F.lit(" s.")
            ),
            F.col("provision"),
        ).alias("obj"),
        F.lit("statute").alias("lane"),
    )
    # case_mentions fixes its id column name to "doc_id"; alias it back
    ca = case_mentions(docs, id_col, text_col).select(
        F.col("doc_id").alias(id_col),
        F.concat(F.lit("doc:"), F.col("doc_id").cast("string")).alias("subj"),
        F.lit("cites_case").alias("pred"),
        F.col("case_key").alias("obj"),
        F.lit("precedent").alias("lane"),
    )
    ju = judge_mentions(docs, text_col, id_col).select(
        F.col(id_col),
        doc_node.alias("subj"),
        F.lit("heard_by").alias("pred"),
        F.col("judge_key").alias("obj"),
        F.lit("bench").alias("lane"),
    )
    dt = (
        extract_dates(docs, text_col, id_col)
        .where(F.col("iso").isNotNull())
        .select(
            F.col(id_col),
            doc_node.alias("subj"),
            F.lit("dated").alias("pred"),
            F.col("iso").cast("string").alias("obj"),
            F.lit("date").alias("lane"),
        )
    )
    qu = quote_attributions(docs, text_col, id_col).select(
        F.col(id_col),
        F.col("speaker").alias("subj"),
        F.lit("stated").alias("pred"),
        F.col("quote").alias("obj"),
        F.lit("quote").alias("lane"),
    )
    out = st
    for lane in (ca, ju, dt, qu):
        out = out.unionByName(lane)
    return out.distinct()


def legal_facts_extended(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """The five core lanes plus the forum/docket/outcome/witness/org/
    penalty lanes — the full fact surface a judgment page yields:

      heard_in      canonical court key        (etl/courts.py)
      docketed_as   canonical docket key       (etl/dockets.py)
      disposed_as   operative outcome          (etl/outcomes.py, LAST rule)
      heard_witness pw/dw/cw + number          (etl/courts.py)
      mentions_org  canonical org key          (etl/orgs.py)
      sentenced_to  regime:months              (etl/money.py)
      awards        currency:amount            (etl/money.py)

    Same plan shape: every added lane is scan-side codegen; the outcome
    lane alone adds one keyed aggregate (its max_by reduction), and the
    closing distinct remains the union's only other shuffle."""
    from .courts import court_mentions, witness_refs
    from .dockets import docket_refs
    from .money import money_amounts, sentence_terms
    from .orgs import org_mentions
    from .outcomes import doc_outcome, outcome_mentions

    def lane(extracted: DataFrame, pred: str, obj, lane_name: str) -> DataFrame:
        return extracted.select(
            F.col(id_col),
            F.concat(F.lit("doc:"), F.col(id_col).cast("string")).alias("subj"),
            F.lit(pred).alias("pred"),
            obj.alias("obj"),
            F.lit(lane_name).alias("lane"),
        )

    co = lane(
        court_mentions(docs, text_col, id_col), "heard_in", F.col("court"), "court"
    )
    dk = lane(
        docket_refs(docs, text_col, id_col),
        "docketed_as",
        F.col("docket_key"),
        "docket",
    )
    oc = lane(
        doc_outcome(outcome_mentions(docs, text_col, id_col), id_col),
        "disposed_as",
        F.col("outcome"),
        "outcome",
    )
    wt = lane(
        witness_refs(docs, text_col, id_col),
        "heard_witness",
        F.concat_ws(":", F.col("side"), F.col("witness_no").cast("string")),
        "witness",
    )
    og = lane(
        org_mentions(docs, text_col, id_col),
        "mentions_org",
        F.col("org_key"),
        "org",
    )
    sn = lane(
        sentence_terms(docs, text_col, id_col),
        "sentenced_to",
        F.concat_ws(":", F.col("regime"), F.col("term_months").cast("string")),
        "penalty",
    )
    mo = lane(
        money_amounts(docs, text_col, id_col),
        "awards",
        F.concat_ws(
            ":",
            F.col("currency"),
            F.col("amount").cast("decimal(20,2)").cast("string"),
        ),
        "money",
    )

    out = legal_facts(docs, text_col, id_col)
    for extra in (co, dk, oc, wt, og, sn, mo):
        out = out.unionByName(extra)
    return out.distinct()
