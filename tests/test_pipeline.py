"""End-to-end extraction parity: distributed pipeline == single-node
reference-semantics loop with the same deterministic scorer (SURVEY §5.2.2)."""

import pytest

from spanluke_spark.etl.tokenize import py_tokenize_offsets
from spanluke_spark.ner.decode import py_adjacent_merge, py_greedy_decode_mentions
from spanluke_spark.ner.scorer import (
    Gazetteer,
    GazetteerTokenScorer,
    HashedGazetteerSpanScorer,
)
from spanluke_spark.pipeline import (
    extract_mentions_span,
    extract_mentions_token,
    mentions_to_triples,
)
from spanluke_spark.schemas import LEGALNER_ENTITIES, encoding_a, idx_to_label


@pytest.fixture(scope="module")
def gaz():
    return Gazetteer(
        {
            "supreme court": "COURT",
            "supreme court of india": "COURT",
            "high court": "COURT",
            "section 302": "PROVISION",
            "indian penal code": "STATUTE",
            "justice k. subba rao": "JUDGE",
        },
        max_words=6,
    )


DOCS = [
    (1, "The Supreme Court of India heard the appeal under Section 302 of the Indian Penal Code ."),
    (2, "Justice K. Subba Rao of the High Court dissented ."),
    (3, "No entities here at all ."),
    (4, ""),
    (5, "supreme court supreme court supreme court"),  # adjacent same-type runs
]


def _oracle_token(gaz):
    scorer = GazetteerTokenScorer(gaz)
    out = set()
    for doc_id, text in DOCS:
        toks = py_tokenize_offsets(text)
        types = scorer.predict_types([t for t, _, _ in toks])
        for m in py_adjacent_merge([(s, e) for _, s, e in toks], types):
            out.add((doc_id, m["start"], m["end"], m["label"], text[m["start"] : m["end"]]))
    return out


def test_token_path_parity(spark, gaz):
    df = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(3)
    got = {
        (r.doc_id, r.start, r.end, r.label, r.surface)
        for r in extract_mentions_token(df, ["doc_id"], gaz).collect()
    }
    assert got == _oracle_token(gaz)
    # doc 5: three adjacent same-type matches merge into ONE mention
    # (inference.py:62-63 semantics — type-level merge ignores B/I).
    doc5 = [g for g in got if g[0] == 5]
    assert len(doc5) == 1 and doc5[0][1] == 0 and doc5[0][2] == len(DOCS[4][1])


def test_span_path_parity(spark, gaz):
    enc = encoding_a(LEGALNER_ENTITIES)
    inv = idx_to_label(enc)
    scorer = HashedGazetteerSpanScorer(gaz, enc, enc["O"])
    expected = set()
    for doc_id, text in DOCS:
        toks = py_tokenize_offsets(text)
        words = [t for t, _, _ in toks]
        spans, scores, preds = scorer.score_sentence(words)
        for ws, we, lbl, _ in py_greedy_decode_mentions(
            len(words), spans, scores, preds, enc["O"], inv
        ):
            expected.add((doc_id, toks[ws][1], toks[we - 1][2], lbl))

    df = spark.createDataFrame(DOCS, "doc_id long, text string").repartition(3)
    got = {
        (r.doc_id, r.start, r.end, r.label)
        for r in extract_mentions_span(df, ["doc_id"], gaz).collect()
    }
    assert got == expected
    # span path must prefer the longest gazetteer span: doc 1 yields the
    # 4-word court, not the 2-word prefix (greedy accepts higher-score first;
    # both hit but overlap resolution keeps exactly one)
    doc1_courts = [g for g in got if g[0] == 1 and g[3] == "COURT"]
    assert len(doc1_courts) == 1


def test_mentions_to_triples_dedupe(spark, gaz):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    mentions = extract_mentions_token(df, ["doc_id"], gaz)
    triples = mentions_to_triples(mentions, subj_col="doc_id")
    rows = triples.collect()
    assert len(rows) == len({(r.subj, r.pred, r.obj) for r in rows})  # distinct
    assert all(r.pred.startswith("mentions_") for r in rows)
