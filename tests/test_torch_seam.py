"""S5/M2 production seam: TorchSpanScorer implements the score_sentence
contract behind an injectable backend; extract_mentions_span accepts a
scorer_factory, proving any backend drops into the fused Arrow kernel
(SURVEY §7.0; reference model load legal_ner/inference.py:13-24)."""

import math

import pytest

from spanluke_spark.ner.scorer import TorchSpanScorer, py_softmax
from spanluke_spark.pipeline import extract_mentions_span
from spanluke_spark.schemas import LEGALNER_ENTITIES, encoding_a

ENC = encoding_a(LEGALNER_ENTITIES)
N_CLASSES = max(ENC.values()) + 1
ORG_ID = ENC["B-ORG"]
OUTSIDE_ID = ENC["O"]


def fake_backend(surfaces):
    """Deterministic logits: 'spark' -> B-ORG with high confidence,
    everything else -> O."""
    out = []
    for s in surfaces:
        logits = [0.0] * N_CLASSES
        if s.lower() == "spark":
            logits[ORG_ID] = 8.0
        else:
            logits[OUTSIDE_ID] = 8.0
        out.append(logits)
    return out


def test_softmax_matches_numpy():
    import numpy as np

    xs = [0.5, -3.0, 8.0, 0.0]
    got = py_softmax(xs)
    want = np.exp(np.array(xs) - 8.0)
    want = want / want.sum()
    assert all(math.isclose(a, b, rel_tol=1e-12) for a, b in zip(got, want))
    assert math.isclose(sum(got), 1.0, rel_tol=1e-12)


def test_torch_scorer_raises_cleanly_without_torch():
    scorer = TorchSpanScorer("/nonexistent/model.pt", ENC)
    with pytest.raises(ImportError, match="torch"):
        scorer.score_sentence(["hello", "world"])


def test_score_sentence_contract_with_fake_backend():
    scorer = TorchSpanScorer(None, ENC, OUTSIDE_ID, backend=fake_backend)
    spans, scores, preds = scorer.score_sentence(["the", "spark", "engine"])
    assert len(spans) == len(scores) == len(preds)
    hit = spans.index((1, 2))
    assert preds[hit] == ORG_ID
    assert scores[hit] > 0.9
    assert all(p == OUTSIDE_ID for i, p in enumerate(preds) if i != hit)


def test_pipeline_pluggability(spark):
    """The injected backend flows through the distributed kernel end-to-end.

    The factory is a self-contained closure (imports inside, constants
    captured by value) — exactly what a production caller ships, since the
    executor can't import the driver's __main__/test module."""
    from spanluke_spark.fixtures import PIPELINE_GAZETTEER

    docs = spark.createDataFrame(
        [(1, "the spark engine"), (2, "no entity here")], "doc_id int, text string"
    )
    n_classes, org_id, outside_id = N_CLASSES, ORG_ID, OUTSIDE_ID
    enc = dict(ENC)

    def factory():
        from spanluke_spark.ner.scorer import TorchSpanScorer as TS

        def backend(surfaces):
            out = []
            for s in surfaces:
                logits = [0.0] * n_classes
                logits[org_id if s.lower() == "spark" else outside_id] = 8.0
                out.append(logits)
            return out

        return TS(None, enc, outside_id, backend=backend)

    got = extract_mentions_span(
        docs, ["doc_id"], PIPELINE_GAZETTEER, scorer_factory=factory
    ).collect()
    assert len(got) == 1
    m = got[0]
    assert (m.doc_id, m.surface, m.label) == (1, "spark", "ORG")
    assert m.score > 0.9


def test_npz_model_file_pipeline_decode_identical(spark):
    """Closes the _load_backend branch with a REAL model artifact: distill
    the LegalNER dev gazetteer into an .npz (export_numpy_model), let
    TorchSpanScorer LOAD it from disk (no injected backend), run the full
    fused pipeline on the dev split, and require decode-identical mentions
    vs the surrogate pipeline — same spans, same labels, same ordering
    decisions on overlaps."""
    import json
    import tempfile

    from pyspark.sql import functions as F

    from spanluke_spark.ner.scorer import Gazetteer, export_numpy_model
    from spanluke_spark.schemas import LEGALNER_ENTITIES

    data = json.load(open("/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"))
    docs, anns = [], []
    for i, item in enumerate(data[:200]):
        docs.append((str(i), item["data"]["text"]))
        for r in item["annotations"][0]["result"]:
            v = r["value"]
            anns.append((v["text"], v["labels"][0]))
    gaz = Gazetteer.from_annotations(anns)
    enc = encoding_a(LEGALNER_ENTITIES)
    outside_id = enc["O"]
    path = tempfile.mktemp(suffix=".npz")
    export_numpy_model(gaz, enc, path, outside_id)

    df = spark.createDataFrame(docs, "doc_id string, text string").repartition(8)

    def factory(p=path, e=dict(enc), o=outside_id):
        from spanluke_spark.ner.scorer import TorchSpanScorer as TS

        return TS(p, e, o)

    surrogate = extract_mentions_span(df, ["doc_id"], gaz)
    from_file = extract_mentions_span(df, ["doc_id"], gaz, scorer_factory=factory)

    key = lambda r: (r["doc_id"], r["start"], r["end"], r["label"], r["surface"])
    a = sorted(key(r) for r in surrogate.collect())
    b = sorted(key(r) for r in from_file.collect())
    assert len(a) > 200
    assert a == b

    # and the file-backend scores reproduce the surrogate's hit scores
    sa = {key(r): r["score"] for r in surrogate.collect()}
    sb = {key(r): r["score"] for r in from_file.collect()}
    assert all(abs(sa[k] - sb[k]) < 1e-9 for k in sa)
