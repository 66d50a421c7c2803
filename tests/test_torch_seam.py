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
