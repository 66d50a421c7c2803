"""Gates for the TRAINED span scorer (VERDICT r3 action item 1).

The committed artifact spanluke_spark/models/legalner_span_lr.npz is a real
learned model: hashed-feature softmax regression fit on the TRAIN side of a
deterministic doc split of SpanLuke's LegalNER dev export (ner/train.py),
evaluated here on the disjoint HELDOUT side through the real distributed
pipeline. The floor asserts genuine generalization quality from learned
weights — the number BASELINE.md reports next to the paper's Table I.
"""

import os

import numpy as np
import pytest

import spanluke_spark
from spanluke_spark.evaluation.metrics import strict_prf
from spanluke_spark.ner.decode import py_greedy_decode_mentions
from spanluke_spark.ner.scorer import NumpyLinearBackend, TorchSpanScorer
from spanluke_spark.ner.train import (
    build_token_training_rows,
    gold_word_spans,
    load_legalner_docs,
    split_docs,
    train_gazetteer,
    train_legalner_span_model,
    train_softmax,
)
from spanluke_spark.pipeline import extract_mentions_span
from spanluke_spark.schemas import LEGALNER_ENTITIES, encoding_a, idx_to_label

DEV_JSON = "/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"
MODEL_PATH = os.path.join(
    os.path.dirname(spanluke_spark.__file__), "models", "legalner_span_lr.npz"
)
ENC = encoding_a(LEGALNER_ENTITIES)


@pytest.fixture(scope="module")
def held_docs():
    _, held = split_docs(load_legalner_docs(DEV_JSON))
    return held


def snapped_gold(docs):
    from spanluke_spark.etl.tokenize import py_tokenize_offsets

    rows = []
    for doc_id, text, anns in docs:
        toks = py_tokenize_offsets(text)
        for ws, we, lbl in gold_word_spans(text, anns):
            if ws >= len(toks):
                continue
            we = min(we, len(toks))
            rows.append((doc_id, toks[ws][1], toks[we - 1][2], lbl))
    return rows


def test_artifact_exists_and_self_describes():
    z = np.load(MODEL_PATH)
    assert str(z["kind"]) == "linear"
    assert int(z["n_classes"]) == max(ENC.values()) + 1
    assert z["W"].shape == (int(z["dim"]), int(z["n_classes"]))


def test_heldout_f1_gate_spark_pipeline(spark, held_docs):
    """The one number the engine never had: strict-span P/R/F1 on unseen
    documents from LEARNED weights, measured through the distributed
    pipeline. Fully deterministic (hash split, zero-init convex training,
    committed artifact) — the floor has margin only for float drift."""
    df = spark.createDataFrame(
        [(d, t) for d, t, _ in held_docs], "doc_id string, text string"
    ).repartition(8)
    pred = extract_mentions_span(
        df, ["doc_id"], gazetteer=None,
        scorer_factory=lambda: TorchSpanScorer(MODEL_PATH, ENC),
    ).selectExpr("doc_id as doc", "start", "end", "label")
    gold = spark.createDataFrame(
        snapped_gold(held_docs), "doc string, start int, end int, label string"
    )
    m = strict_prf(gold, pred)
    # measured: P=0.5733 R=0.3513 F1=0.4356 (tools/train_span_model.py,
    # round-5 CV-selected retrain: epochs=120 + O-margin 1.0)
    assert m["precision"] >= 0.55, m
    assert m["recall"] >= 0.33, m
    assert m["f1"] >= 0.42, m


def test_spark_pipeline_matches_driver_decode(spark, held_docs):
    """Distributed extraction through NumpyLinearBackend == the verbatim
    single-threaded loop — model-weights-on-executors parity."""
    from spanluke_spark.etl.tokenize import py_tokenize_offsets

    docs = held_docs[:40]
    inv = idx_to_label(ENC)
    scorer = TorchSpanScorer(MODEL_PATH, ENC)
    expected = set()
    for doc_id, text, _ in docs:
        toks = py_tokenize_offsets(text)
        words = [t for t, _, _ in toks]
        spans, scores, preds = scorer.score_sentence(words)
        for ws, we, lbl, _sc in py_greedy_decode_mentions(
            len(words), spans, scores, preds, ENC["O"], inv
        ):
            expected.add((doc_id, toks[ws][1], toks[we - 1][2], lbl))

    df = spark.createDataFrame(
        [(d, t) for d, t, _ in docs], "doc_id string, text string"
    ).repartition(8)
    got = {
        (r.doc_id, r.start, r.end, r.label)
        for r in extract_mentions_span(
            df, ["doc_id"], gazetteer=None,
            scorer_factory=lambda: TorchSpanScorer(MODEL_PATH, ENC),
        ).collect()
    }
    assert got == expected


def test_featurizer_version_gate(tmp_path):
    bad = str(tmp_path / "bad.npz")
    np.savez(
        bad,
        kind=np.str_("linear"),
        featurizer=np.str_("spanfeat-v0-bogus"),
        W=np.zeros((8, 3), dtype=np.float16),
        b=np.zeros(3),
        dim=np.int64(8),
        gaz_json=np.str_("{}"),
    )
    with pytest.raises(ValueError, match="featurizer"):
        NumpyLinearBackend(bad)(["Supreme Court"])


def test_trainer_is_deterministic(tmp_path):
    docs = load_legalner_docs(DEV_JSON)[:40]
    p1 = train_legalner_span_model(
        docs, ENC, ENC["O"], str(tmp_path / "m1.npz"), epochs=3, neg_keep=0.2
    )
    p2 = train_legalner_span_model(
        docs, ENC, ENC["O"], str(tmp_path / "m2.npz"), epochs=3, neg_keep=0.2
    )
    z1, z2 = np.load(p1), np.load(p2)
    assert np.array_equal(z1["W"], z2["W"]) and np.array_equal(z1["b"], z2["b"])


def test_token_trainer_fits_train_set():
    """Sanity for the token-path trainer (M1 twin): the convex model drives
    training loss down far enough to reproduce the training tags. (Heldout
    token-path quality is below the span path — recorded in
    models/TRAINING.md — so the committed artifact is the span model.)"""
    docs = load_legalner_docs(DEV_JSON)[:60]
    gaz = train_gazetteer(docs)
    feats, labels, weights = build_token_training_rows(docs, ENC, ENC["O"], gaz)
    W, b = train_softmax(
        feats, labels, weights, n_classes=max(ENC.values()) + 1, epochs=40
    )
    counts = np.asarray([len(f) for f in feats])
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    flat = np.fromiter((j for f in feats for j in f), dtype=np.int64)
    preds = (np.add.reduceat(W[flat], starts, axis=0) + b).argmax(axis=1)
    acc = float((preds == np.asarray(labels)).mean())
    assert acc >= 0.97, acc
