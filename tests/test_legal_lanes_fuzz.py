"""Fuzz: every legal extraction lane must handle arbitrary text without
error and keep its output invariants (no crash, no NULL keys, idx dense
per doc). One Spark job over a hypothesis-generated corpus per lane
family keeps the suite fast."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from spanluke_spark.etl.acronyms import acronym_definitions
from spanluke_spark.etl.courts import court_mentions, witness_refs
from spanluke_spark.etl.dates import extract_dates
from spanluke_spark.etl.dockets import docket_refs, para_crossrefs
from spanluke_spark.etl.judges import judge_mentions
from spanluke_spark.etl.legalfacts import legal_facts_extended, legal_facts_onepass
from spanluke_spark.etl.money import money_amounts, sentence_terms
from spanluke_spark.etl.orgs import org_mentions
from spanluke_spark.etl.outcomes import outcome_mentions
from spanluke_spark.etl.paragraphs import split_paragraphs
from spanluke_spark.etl.quotes import (
    quote_attributions,
    quote_attributions_ordered,
    resolve_pronoun_speakers,
)
from spanluke_spark.etl.statutes import statute_citations
from spanluke_spark.graph.citations import case_mentions, case_treatments

_LANES = [
    quote_attributions,
    statute_citations,
    judge_mentions,
    extract_dates,
    court_mentions,
    witness_refs,
    outcome_mentions,
    acronym_definitions,
    docket_refs,
    para_crossrefs,
    money_amounts,
    sentence_terms,
    org_mentions,
    split_paragraphs,
    case_mentions,
    case_treatments,
]

# adversarial alphabet: quote chars, regex metachars-as-text, legal
# keywords, digits, unicode, newlines
_ALPHA = st.sampled_from(
    [
        '"', "'", ".", ",", "(", ")", "v.", "vs", "Section", "said",
        "Justice", "IPC", "Ltd.", "Rs.", "$", "PW-1", "para", "No.",
        "1998", "302", "12.03.2004", "café", "Ω", "\\", "\n", "1. ",
        "According", "to", "of", "the", "A", "Z.", "overruled", "in",
        "imprisonment", "for", "years", "allowed", "crore", "(PCA)",
    ]
)
_TEXT = st.lists(_ALPHA, min_size=0, max_size=40).map(" ".join)


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=6))
def test_lanes_never_crash_and_keys_non_null(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for lane in _LANES:
        rows = lane(df).collect()
        for r in rows:
            d = r.asDict()
            # extraction outputs must never carry NULL identity columns
            for k, v in d.items():
                if k in ("doc_id", "idx", "pattern", "case_key", "judge_key",
                         "docket_key", "org_key", "court", "outcome"):
                    assert v is not None, (lane.__name__, k, d)


@settings(max_examples=8, deadline=None)
@given(texts=st.lists(_TEXT, min_size=1, max_size=4))
def test_onepass_union_parity_on_fuzz(spark, texts):
    """The strongest invariant: both fact formulations agree on
    arbitrary adversarial text, not just the synthesized corpus."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    a = {tuple(r) for r in legal_facts_extended(df).collect()}
    b = {tuple(r) for r in legal_facts_onepass(df).collect()}
    assert a == b
