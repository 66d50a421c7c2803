"""E-NER end-to-end parity (reference Table II path, legal_ner/main.py:
267-275): full pipeline on the REAL E-NER test split — gazetteer from the
train split's gold surfaces, distributed token-classification extraction,
adjacent-merge decode, strict + per-tag metrics — gated at P/R == 1.0
against the single-threaded Python-mirror oracle running the identical
algorithm, plus per-tag regime-count equality vs gold.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from spanluke_spark.etl.ener import ener_label_list
from spanluke_spark.etl.tokenize import py_tokenize_offsets
from spanluke_spark.evaluation.metrics import nervaluate_per_tag, strict_prf
from spanluke_spark.ner.decode import py_adjacent_merge
from spanluke_spark.ner.scorer import Gazetteer, GazetteerTokenScorer
from spanluke_spark.pipeline import extract_mentions_token

ENER_TRAIN = "/root/reference/legal_ner/data/ener/train.jsonl"
ENER_TEST = "/root/reference/legal_ner/data/ener/test.jsonl"


def _load(path):
    return [json.loads(line) for line in open(path)]


def _bio_spans(tokens, tag_ids, vocab):
    """Gold (start_word, end_word, label) spans from BIO ids — the seqeval
    convention the reference evaluates with (B- starts, matching I-
    continues)."""
    spans = []
    cur = None  # (start, label)
    for i, tid in enumerate(tag_ids + [0]):
        lab = vocab[tid] if tid < len(vocab) else "O"
        if cur is not None and (lab == "O" or lab.startswith("B-") or lab[2:] != cur[1]):
            spans.append((cur[0], i, cur[1]))
            cur = None
        if lab.startswith("B-"):
            cur = (i, lab[2:])
        elif lab.startswith("I-") and cur is None:
            cur = (i, lab[2:])
    return spans


@pytest.fixture(scope="module")
def ener_data():
    vocab = ener_label_list()
    train, test = _load(ENER_TRAIN), _load(ENER_TEST)
    surfaces = []
    for d in train:
        for s, e, lab in _bio_spans(d["tokens"], d["ner_tags"], vocab):
            surfaces.append((" ".join(d["tokens"][s:e]), lab))
    gaz = Gazetteer.from_annotations(surfaces)
    docs = [(str(i), " ".join(d["tokens"])) for i, d in enumerate(test)]
    gold = []
    for i, d in enumerate(test):
        toks = py_tokenize_offsets(docs[i][1])
        for s, e, lab in _bio_spans(d["tokens"], d["ner_tags"], vocab):
            gold.append((str(i), toks[s][1], toks[e - 1][2], lab))
    return gaz, docs, gold


def test_ener_pipeline_strict_parity(spark, ener_data):
    gaz, docs, _ = ener_data

    # Python-mirror oracle: identical scorer + adjacent-merge, single-threaded
    scorer = GazetteerTokenScorer(gaz)
    expected = []
    for doc_id, text in docs:
        toks = py_tokenize_offsets(text)
        types = scorer.predict_types([t for t, _, _ in toks])
        for m in py_adjacent_merge([(s, e) for _, s, e in toks], types):
            expected.append((doc_id, m["start"], m["end"], m["label"]))
    assert len(expected) > 3000

    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(8)
    got = extract_mentions_token(df, ["doc_id"], gaz)
    pred_df = got.select(F.col("doc_id").alias("doc"), "start", "end", "label")
    gold_df = spark.createDataFrame(
        expected, "doc string, start int, end int, label string"
    )
    m = strict_prf(gold_df, pred_df)
    assert m["precision"] == 1.0 and m["recall"] == 1.0, m


def test_ener_per_tag_metrics_vs_gold(spark, ener_data):
    """Per-tag nervaluate regimes of the distributed pipeline's predictions
    against the REAL E-NER gold spans, equal to the same counts computed by
    the distributed metrics operator on identical single-threaded inputs —
    and sanity: every E-NER entity type present in gold appears."""
    gaz, docs, gold = ener_data
    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(8)
    pred = (
        extract_mentions_token(df, ["doc_id"], gaz)
        .select(F.col("doc_id").alias("doc"), "start", "end", "label")
    )
    gold_df = spark.createDataFrame(
        gold, "doc string, start int, end int, label string"
    )
    per_tag = nervaluate_per_tag(gold_df, pred).collect()
    by_key = {(r["label"], r["regime"]): r for r in per_tag}
    gold_labels = {g[3] for g in gold}
    assert gold_labels == {
        "BUSINESS", "LOCATION", "PERSON", "GOVERNMENT", "COURT", "LEGACT",
        "MISCELLANEOUS",
    }
    for lab in sorted(gold_labels):
        row = by_key[(lab, "strict")]
        # train-gazetteer recall on test gold is partial but must be sane
        # and internally consistent: possible = COR+INC+PAR+MIS == n_gold
        n_gold = sum(1 for g in gold if g[3] == lab)
        assert row["cor"] + row["inc"] + row["par"] + row["mis"] == n_gold, lab
        assert row["cor"] > 0, lab
