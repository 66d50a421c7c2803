"""Exact reach curve — BFS set-replay parity, chain/cycle closed forms,
monotonicity, hop-0 identity, and cross-word (>64 nodes) coverage."""

from __future__ import annotations

import random

from spanluke_spark.graph.neighborhood import exact_reach_curve


def _py_curve(edges, max_hops):
    adj = {}
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        adj.setdefault(u, set()).add(v)
    reach = {n: {n} for n in nodes}
    out = [sum(len(s) for s in reach.values())]
    for _ in range(max_hops):
        reach = {
            n: reach[n] | set().union(*(reach[m] for m in adj.get(n, ())) or [set()])
            for n in nodes
        }
        out.append(sum(len(s) for s in reach.values()))
    return out


def _spark_curve(spark, edges, max_hops=4):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    rows = exact_reach_curve(df, max_hops=max_hops).collect()
    return [r["reachable_pairs"] for r in sorted(rows, key=lambda r: r["hop"])]


def test_python_replay_parity(spark):
    rng = random.Random(9)
    edges = list(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(50)}
    )
    assert _spark_curve(spark, edges) == _py_curve(edges, 4)


def test_chain_closed_form(spark):
    # 0->1->2->3->4: at hop t each node sees min(t, remaining) extra nodes
    edges = [(i, i + 1) for i in range(4)]
    got = _spark_curve(spark, edges, max_hops=4)
    assert got == [5, 9, 12, 14, 15]


def test_cycle_saturates(spark):
    n = 6
    edges = [(i, (i + 1) % n) for i in range(n)]
    got = _spark_curve(spark, edges, max_hops=n)
    assert got[0] == n and got[n - 1] == n * n == got[n]


def test_monotone_and_hop0_identity(spark):
    rng = random.Random(2)
    edges = list({(rng.randrange(20), rng.randrange(20)) for _ in range(30)})
    got = _spark_curve(spark, edges)
    nodes = {x for e in edges for x in e}
    assert got[0] == len(nodes)
    assert all(a <= b for a, b in zip(got, got[1:]))


def test_crosses_word_boundary(spark):
    # a 130-node chain spans 3 bitset words, incl. bit 63 at both ends
    edges = [(i, i + 1) for i in range(129)]
    got = _spark_curve(spark, edges, max_hops=2)
    n = 130
    assert got[0] == n and got[1] == n + 129 and got[2] == n + 129 + 128
