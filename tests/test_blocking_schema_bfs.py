"""Blocking metrics, schema induction, seed-BFS hop distance."""

from __future__ import annotations

import pytest

from spanluke_spark.evaluation.blocking import blocking_metrics
from spanluke_spark.graph.closure import hop_distance
from spanluke_spark.graph.schema_induce import UNTYPED, induce_schema

_PAIRS = "id_a long, id_b long"


def test_blocking_metrics_hand_computed(spark):
    # gold: {1-2, 3-4, 5-6}; candidates: {1-2 (hit, listed twice reversed),
    # 3-4 (hit), 7-8, 9-10} -> hit=2, cand=4, gold=3
    gold = spark.createDataFrame([(1, 2), (3, 4), (5, 6)], _PAIRS)
    cand = spark.createDataFrame(
        [(1, 2), (2, 1), (4, 3), (7, 8), (9, 10), (9, 9)], _PAIRS
    )
    m = blocking_metrics(cand, gold, n_records=10).collect()[0]
    assert (m.n_candidates, m.n_gold, m.n_hit) == (4, 3, 2)
    assert m.pair_completeness == pytest.approx(2 / 3)
    assert m.pairs_quality == pytest.approx(0.5)
    assert m.reduction_ratio == pytest.approx(1 - 4 / 45)


def test_blocking_metrics_perfect_blocker(spark):
    gold = spark.createDataFrame([(1, 2), (3, 4)], _PAIRS)
    m = blocking_metrics(gold, gold, n_records=4).collect()[0]
    assert m.pair_completeness == 1.0 and m.pairs_quality == 1.0


def test_schema_induction_counts_and_untyped(spark):
    triples = spark.createDataFrame(
        [
            ("c1", "decided_by", "j1"),
            ("c2", "decided_by", "j1"),
            ("c1", "cites", "c2"),
            ("x", "decided_by", "j1"),  # untyped subj
        ],
        "subj string, pred string, obj string",
    )
    types = spark.createDataFrame(
        [("c1", "case"), ("c2", "case"), ("j1", "judge")],
        "entity string, type string",
    )
    rows = {
        (r.subj_type, r.pred, r.obj_type): (r.n_facts, r.n_subj, r.n_obj)
        for r in induce_schema(triples, types).collect()
    }
    assert rows[("case", "decided_by", "judge")] == (2, 2, 1)
    assert rows[("case", "cites", "case")] == (1, 1, 1)
    assert rows[(UNTYPED, "decided_by", "judge")] == (1, 1, 1)


def test_schema_induction_multitype_fanout(spark):
    triples = spark.createDataFrame(
        [("a", "p", "b")], "subj string, pred string, obj string"
    )
    types = spark.createDataFrame(
        [("a", "t1"), ("a", "t2"), ("b", "u")], "entity string, type string"
    )
    got = {
        (r.subj_type, r.pred, r.obj_type)
        for r in induce_schema(triples, types).collect()
    }
    assert got == {("t1", "p", "u"), ("t2", "p", "u")}


def test_hop_distance_bfs_layers(spark):
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("b", "c"), ("c", "d"), ("a", "s"), ("z", "q")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",)], "node string")
    d = {r.node: r.dist for r in hop_distance(edges, seeds, max_hops=3).collect()}
    # min distance wins (s reachable at 0 and again at 2 -> stays 0)
    assert d == {"s": 0, "a": 1, "b": 2, "c": 3}  # d beyond cap; z/q unreachable


def test_hop_distance_early_exit_and_multi_seed(spark):
    edges = spark.createDataFrame([("s1", "m"), ("s2", "m")], "src string, dst string")
    seeds = spark.createDataFrame([("s1",), ("s2",)], "node string")
    d = {r.node: r.dist for r in hop_distance(edges, seeds, max_hops=10).collect()}
    assert d == {"s1": 0, "s2": 0, "m": 1}
