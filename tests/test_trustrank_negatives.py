"""TrustRank seed-biased PageRank + filtered KG negative sampling."""

from __future__ import annotations

import pytest

from spanluke_spark.graph.negatives import corrupt_triples
from spanluke_spark.graph.pagerank import trustrank

_EDGE_SCHEMA = "src string, dst string"


def test_trustrank_hand_computed_one_round(spark):
    edges = spark.createDataFrame([("a", "b"), ("b", "a")], _EDGE_SCHEMA)
    seeds = spark.createDataFrame([("a",)], "node string")
    r = {x.node: x.rank for x in trustrank(edges, seeds, iters=1).collect()}
    assert r["a"] == pytest.approx(0.15)
    assert r["b"] == pytest.approx(0.85)


def test_trustrank_spam_island_gets_zero(spark):
    edges = spark.createDataFrame(
        [("s", "g"), ("g", "s"), ("x", "y"), ("y", "x")], _EDGE_SCHEMA
    )
    seeds = spark.createDataFrame([("s",)], "node string")
    r = {x.node: x.rank for x in trustrank(edges, seeds, iters=3).collect()}
    assert r["x"] == 0.0 and r["y"] == 0.0
    assert r["s"] > 0.0 and r["g"] > 0.0


def test_trustrank_dangling_mass_conserved(spark):
    # b has no out-edges: its mass must re-teleport through the seed
    # vector, keeping total mass 1 every round
    edges = spark.createDataFrame([("a", "b")], _EDGE_SCHEMA)
    seeds = spark.createDataFrame([("a",)], "node string")
    r = {x.node: x.rank for x in trustrank(edges, seeds, iters=2).collect()}
    assert r["a"] == pytest.approx(0.8725)
    assert r["b"] == pytest.approx(0.1275)
    assert sum(r.values()) == pytest.approx(1.0)


_TRIPLES = [
    (f"e{i % 11}", f"p{i % 3}", f"e{(i * 5 + 2) % 11}") for i in range(60)
]


def test_negatives_filtered_and_corrupted(spark):
    t = spark.createDataFrame(
        _TRIPLES, "subj string, pred string, obj string"
    )
    neg = corrupt_triples(t, n_neg=3).collect()
    assert len(neg) > 0
    true_set = set(_TRIPLES)
    entities = {s for s, _, _ in _TRIPLES} | {o for _, _, o in _TRIPLES}
    for r in neg:
        assert (r.subj, r.pred, r.obj_neg) not in true_set
        assert r.obj_neg in entities
        assert 0 <= r.k < 3


def test_negatives_deterministic(spark):
    t = spark.createDataFrame(
        _TRIPLES, "subj string, pred string, obj string"
    )
    a = {tuple(r) for r in corrupt_triples(t, n_neg=2).collect()}
    b = {tuple(r) for r in corrupt_triples(t, n_neg=2).collect()}
    assert a == b
    c = {tuple(r) for r in corrupt_triples(t, n_neg=2, salt="other").collect()}
    assert a != c  # salt really steers the draw


def test_negatives_yield_near_n_neg(spark):
    # with 11 entities and a sparse true set, most attempts survive the
    # filter: expect well over half of n_neg * |distinct triples|
    t = spark.createDataFrame(
        _TRIPLES, "subj string, pred string, obj string"
    )
    n_true = t.distinct().count()
    n = corrupt_triples(t, n_neg=4).count()
    assert n > 2 * n_true
