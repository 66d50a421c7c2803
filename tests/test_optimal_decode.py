"""Optimal span selection vs greedy and vs brute force (ner/optimal.py)."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from spanluke_spark.ner.decode import py_greedy_decode_mentions
from spanluke_spark.ner.optimal import optimal_decode, py_optimal_decode_mentions
from spanluke_spark.ner.spans import py_enumerate_spans

_ID2LABEL = {0: "O", 1: "B-COURT", 2: "B-JUDGE"}


def _brute_best(spans, scores, preds):
    """Exhaustive max-total over non-overlapping non-outside subsets."""
    cands = [
        (ws, we, sc)
        for (ws, we), sc, pl in zip(spans, scores, preds)
        if pl != 0
    ]
    best = 0.0
    for r in range(len(cands) + 1):
        for combo in itertools.combinations(cands, r):
            ok = all(
                a[1] <= b[0] or b[1] <= a[0]
                for a, b in itertools.combinations(combo, 2)
            )
            if ok:
                best = max(best, sum(c[2] for c in combo))
    return best


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=5),
    data=st.data(),
)
def test_optimal_matches_brute_force(n, data):
    spans = py_enumerate_spans(n, 3)
    scores = [
        data.draw(st.floats(min_value=0.01, max_value=1.0))
        for _ in spans
    ]
    preds = [data.draw(st.sampled_from([0, 1, 2])) for _ in spans]
    out = py_optimal_decode_mentions(n, spans, scores, preds, 0, _ID2LABEL)
    total = sum(o[3] for o in out)
    assert abs(total - _brute_best(spans, scores, preds)) < 1e-9
    # selection is pairwise non-overlapping
    for a, b in itertools.combinations(out, 2):
        assert a[1] <= b[0] or b[1] <= a[0]


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=8),
    data=st.data(),
)
def test_optimal_at_least_greedy(n, data):
    spans = py_enumerate_spans(n, 4)
    scores = [
        data.draw(st.floats(min_value=0.01, max_value=1.0))
        for _ in spans
    ]
    preds = [data.draw(st.sampled_from([0, 1, 2])) for _ in spans]
    opt = py_optimal_decode_mentions(n, spans, scores, preds, 0, _ID2LABEL)
    greedy = py_greedy_decode_mentions(n, spans, scores, preds, 0, _ID2LABEL)
    assert sum(o[3] for o in opt) >= sum(g[3] for g in greedy) - 1e-12


def test_greedy_suboptimal_case_exact():
    # one long span (0,2) score 0.6 vs two short 0.4+0.4: greedy takes
    # the long one, optimal takes the pair
    spans = [(0, 1), (0, 2), (1, 2)]
    scores = [0.4, 0.6, 0.4]
    preds = [1, 1, 1]
    opt = py_optimal_decode_mentions(2, spans, scores, preds, 0, _ID2LABEL)
    assert [(o[0], o[1]) for o in opt] == [(0, 1), (1, 2)]
    greedy = py_greedy_decode_mentions(2, spans, scores, preds, 0, _ID2LABEL)
    assert [(g[0], g[1]) for g in greedy] == [(0, 2)]


def test_deterministic_and_empty():
    spans = py_enumerate_spans(4, 3)
    scores = [0.5] * len(spans)
    preds = [1] * len(spans)
    a = py_optimal_decode_mentions(4, spans, scores, preds, 0, _ID2LABEL)
    b = py_optimal_decode_mentions(4, spans, scores, preds, 0, _ID2LABEL)
    assert a == b
    assert py_optimal_decode_mentions(4, spans, scores, [0] * len(spans), 0, _ID2LABEL) == []


def test_distributed_matches_kernel(spark):
    import random

    rng = random.Random(7)
    rows = []
    for doc in range(20):
        n = rng.randint(1, 6)
        spans = py_enumerate_spans(n)
        rows.append(
            (
                doc,
                n,
                [rng.uniform(0.01, 1.0) for _ in spans],
                [rng.choice([0, 1, 2]) for _ in spans],
            )
        )
    df = spark.createDataFrame(
        rows, "doc_id long, num_words int, scores array<double>, preds array<int>"
    )
    got = {
        (r.doc_id, r.w_start, r.w_end, r.label)
        for r in optimal_decode(df, ["doc_id"], _ID2LABEL).collect()
    }
    want = set()
    for doc, n, scores, preds in rows:
        for ws, we, lbl, _ in py_optimal_decode_mentions(
            n, py_enumerate_spans(n), scores, preds, 0, _ID2LABEL
        ):
            want.add((doc, ws, we, lbl))
    assert got == want
