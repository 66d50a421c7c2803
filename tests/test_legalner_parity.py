"""BASELINE.json gate: strict-span triple P/R >= 0.95 vs the reference-
semantics oracle on SpanLuke's own LegalNER evaluation split.

Oracle = verbatim single-threaded Python implementation of the reference's
inference algorithm (legal_ner/inference.py:35-81 adjacent-merge; legal_ner/
main.py:409-413 greedy span decode) run with the SAME deterministic scorer.
Parity therefore measures our distributed decode/pipeline, independent of
model weights (SURVEY.md §7.5).
"""

import json

import pytest
from pyspark.sql import functions as F

from spanluke_spark.etl.tokenize import py_tokenize_offsets
from spanluke_spark.evaluation.metrics import strict_prf
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

DEV_JSON = "/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"


@pytest.fixture(scope="module")
def dev_docs():
    data = json.load(open(DEV_JSON))
    docs, anns = [], []
    for i, item in enumerate(data):
        docs.append((str(i), item["data"]["text"]))
        for r in item["annotations"][0]["result"]:
            v = r["value"]
            anns.append((str(i), v["start"], v["end"], v["labels"][0], v["text"]))
    return docs, anns


@pytest.fixture(scope="module")
def dev_gazetteer(dev_docs):
    _, anns = dev_docs
    return Gazetteer.from_annotations((surface, label) for _, _, _, label, surface in anns)


def test_token_path_strict_parity(spark, dev_docs, dev_gazetteer):
    docs, _ = dev_docs

    # Reference-semantics oracle (single-threaded, verbatim algorithm)
    scorer = GazetteerTokenScorer(dev_gazetteer)
    expected = []
    for doc_id, text in docs:
        toks = py_tokenize_offsets(text)
        types = scorer.predict_types([t for t, _, _ in toks])
        for m in py_adjacent_merge([(s, e) for _, s, e in toks], types):
            expected.append((doc_id, m["start"], m["end"], m["label"]))

    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(8)
    got = extract_mentions_token(df, ["doc_id"], dev_gazetteer)

    gold_df = spark.createDataFrame(expected, "doc string, start int, end int, label string")
    pred_df = got.select(
        F.col("doc_id").alias("doc"), "start", "end", "label"
    )
    m = strict_prf(gold_df, pred_df)
    assert len(expected) > 2000
    assert m["precision"] >= 0.95 and m["recall"] >= 0.95, m
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m  # exact, not just >=0.95


def test_span_path_strict_parity(spark, dev_docs, dev_gazetteer):
    docs, _ = dev_docs
    enc = encoding_a(LEGALNER_ENTITIES)
    inv = idx_to_label(enc)
    scorer = HashedGazetteerSpanScorer(dev_gazetteer, enc, enc["O"])

    expected = []
    for doc_id, text in docs:
        toks = py_tokenize_offsets(text)
        words = [t for t, _, _ in toks]
        spans, scores, preds = scorer.score_sentence(words)
        for ws, we, lbl, _ in py_greedy_decode_mentions(
            len(words), spans, scores, preds, enc["O"], inv
        ):
            expected.append((doc_id, toks[ws][1], toks[we - 1][2], lbl))

    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(8)
    got = extract_mentions_span(df, ["doc_id"], dev_gazetteer)

    gold_df = spark.createDataFrame(expected, "doc string, start int, end int, label string")
    pred_df = got.select(F.col("doc_id").alias("doc"), "start", "end", "label")
    m = strict_prf(gold_df, pred_df)
    assert len(expected) > 2000
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m


def test_triple_parity_and_gold_quality(spark, dev_docs, dev_gazetteer):
    """Triples from the distributed pipeline == triples from oracle mentions
    (the BASELINE '(subj,pred,obj)' framing), plus a report of strict P/R vs
    the human gold annotations for the record."""
    docs, anns = dev_docs
    scorer = GazetteerTokenScorer(dev_gazetteer)
    expected_rows = []
    for doc_id, text in docs:
        toks = py_tokenize_offsets(text)
        types = scorer.predict_types([t for t, _, _ in toks])
        for m in py_adjacent_merge([(s, e) for _, s, e in toks], types):
            expected_rows.append(
                (doc_id, 0, m["start"], m["end"], text[m["start"] : m["end"]], m["label"], 1.0)
            )
    exp_mentions = spark.createDataFrame(
        expected_rows,
        "doc_id string, sent_id int, start int, end int, surface string, label string, score double",
    )
    exp_triples = {
        (r.subj, r.pred, r.obj)
        for r in mentions_to_triples(exp_mentions, subj_col="doc_id").collect()
    }

    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(8)
    got_triples = {
        (r.subj, r.pred, r.obj)
        for r in mentions_to_triples(
            extract_mentions_token(df, ["doc_id"], dev_gazetteer), subj_col="doc_id"
        ).collect()
    }
    tp = len(exp_triples & got_triples)
    precision = tp / len(got_triples)
    recall = tp / len(exp_triples)
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    assert precision == 1.0 and recall == 1.0

    # Informational: scorer quality vs human gold (not the parity gate).
    gold_df = spark.createDataFrame(
        [(d, s, e, l) for d, s, e, l, _ in anns], "doc string, start int, end int, label string"
    )
    pred_df = spark.createDataFrame(
        [(r[0], r[2], r[3], r[5]) for r in expected_rows],
        "doc string, start int, end int, label string",
    )
    q = strict_prf(gold_df, pred_df)
    print(
        f"\n[info] gazetteer-surrogate vs human gold (dev): "
        f"P={q['precision']:.3f} R={q['recall']:.3f} F1={q['f1']:.3f}"
    )
