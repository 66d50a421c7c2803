"""Scale-shape stress tests for the session-4 iterative operators:
hot keys, random-graph parity vs pure-Python references."""

from __future__ import annotations

import pytest

from spanluke_spark.graph.analytics import k_core
from spanluke_spark.graph.truth import truth_discovery


def test_truth_discovery_hot_fact(spark):
    # one (subj, pred) asserted by 5,000 distinct sources (the
    # "capital of France" of the crawl) + a long tail; the belief
    # normalize is agg+join, so the hot key must not serialize
    rows = [(f"src{i}", "paris", "capital", "FR") for i in range(5000)]
    rows += [(f"bad{i}", "paris", "capital", "WRONG") for i in range(50)]
    rows += [(f"t{i}", f"e{i}", "p", f"v{i}") for i in range(200)]
    claims = spark.createDataFrame(
        rows, "source string, subj string, pred string, obj string"
    )
    facts, trust = truth_discovery(claims, rounds=2)
    hot = facts.where(
        (facts.subj == "paris") & (facts.pred == "capital")
    ).collect()[0]
    assert hot.obj == "FR" and hot.n_sources == 5000
    assert hot.belief > 0.97
    assert trust.count() == 5050 + 200


def test_k_core_random_graph_matches_python_peeling(spark):
    import random

    rng = random.Random(11)
    edges = list({
        (f"n{rng.randrange(60)}", f"n{rng.randrange(60)}")
        for _ in range(300)
    })
    df = spark.createDataFrame(edges, "src string, dst string")
    for k in (2, 3, 4):
        got = {r.node: r.core_degree for r in k_core(df, k).collect()}

        # reference: sequential peeling on the undirected simple graph
        adj: dict[str, set[str]] = {}
        for a, b in edges:
            if a == b:
                continue
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        changed = True
        while changed:
            changed = False
            for n in [n for n, ns in adj.items() if len(ns) < k]:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
        ref = {n: len(ns) for n, ns in adj.items() if ns}
        assert got == ref, f"k={k}"


def test_k_core_long_chain_peels_fully(spark):
    # a 200-chain has NO 2-core; peeling must unwind it end to end
    edges = [(f"c{i}", f"c{i+1}") for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string")
    assert k_core(df, 2, max_rounds=300).count() == 0
