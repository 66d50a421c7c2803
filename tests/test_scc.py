"""Strongly connected components — closed forms (cycle, DAG, figure-8),
Tarjan parity on random directed graphs, trim-path coverage, and the
condensation-DAG contract (acyclicity + cross-edge exactness)."""

from __future__ import annotations

import random

from spanluke_spark.graph.scc import (
    condensation_edges,
    py_scc,
    strongly_connected_components,
)


def _spark_scc(spark, edges):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    rows = strongly_connected_components(df).collect()
    return {r["node"]: r["scc_id"] for r in rows}


def test_single_cycle_one_scc(spark):
    edges = [(i, (i + 1) % 5) for i in range(5)]
    got = _spark_scc(spark, edges)
    assert got == {i: 0 for i in range(5)}


def test_dag_all_singletons(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = _spark_scc(spark, edges)
    assert got == {i: i for i in range(5)}


def test_figure_eight_merges(spark):
    # two cycles sharing node 2 -> one SCC
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)]
    got = _spark_scc(spark, edges)
    assert got == {i: 0 for i in range(5)}


def test_two_cycles_bridged_by_dag_edge_stay_apart(spark):
    edges = [(0, 1), (1, 0), (10, 11), (11, 10), (1, 10)]
    got = _spark_scc(spark, edges)
    assert got == {0: 0, 1: 0, 10: 10, 11: 10}


def test_matches_tarjan_on_random_graphs(spark):
    for seed, n, m in [(1, 14, 25), (2, 20, 40), (3, 30, 45), (7, 12, 60)]:
        rng = random.Random(seed)
        edges = list(
            {(rng.randrange(n), rng.randrange(n)) for _ in range(m)}
        )
        edges = [(u, v) for u, v in edges if u != v]
        assert _spark_scc(spark, edges) == py_scc(edges), f"seed={seed}"


def test_self_loops_ignored(spark):
    edges = [(0, 0), (0, 1), (1, 0), (5, 5)]
    got = _spark_scc(spark, edges)
    assert got == {0: 0, 1: 0}  # node 5 only in a self-loop -> excluded


def test_condensation_is_acyclic_and_exact(spark):
    rng = random.Random(11)
    edges = list({(rng.randrange(18), rng.randrange(18)) for _ in range(40)})
    edges = [(u, v) for u, v in edges if u != v]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    labels = strongly_connected_components(df)
    cond = condensation_edges(df, labels)
    pairs = {(r["scc_src"], r["scc_dst"]) for r in cond.collect()}
    lab = {r["node"]: r["scc_id"] for r in labels.collect()}
    want = {(lab[u], lab[v]) for u, v in edges if lab[u] != lab[v]}
    assert pairs == want
    # acyclic: Kahn peeling consumes every condensation node
    nodes = {x for p in pairs for x in p} | set(lab.values())
    adj, indeg = {}, {x: 0 for x in nodes}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        indeg[b] += 1
    queue = [x for x in nodes if indeg[x] == 0]
    seen = 0
    while queue:
        x = queue.pop()
        seen += 1
        for y in adj.get(x, []):
            indeg[y] -= 1
            if indeg[y] == 0:
                queue.append(y)
    assert seen == len(nodes)


def test_deep_trim_chain(spark):
    # a 30-deep pure chain exercises repeated trim rounds (no color phase)
    edges = [(i, i + 1) for i in range(30)]
    got = _spark_scc(spark, edges)
    assert got == {i: i for i in range(31)}


def test_long_cycle_deep_propagation(spark):
    # a single 60-cycle: color propagation must walk the full diameter
    edges = [(i, (i + 1) % 60) for i in range(60)]
    got = _spark_scc(spark, edges)
    assert got == {i: 0 for i in range(60)}
