"""OPIC (cash conservation, dangling redistribution, Python replay
parity, importance sums to 1) and modularity (closed-form anchors:
perfect partition, random mixing ~0, single-community identity,
networkx-formula parity on a planted graph)."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.graph.pagerank import opic
from spanluke_spark.graph.partitioning import modularity


def _py_opic(edges, rounds=5):
    edges = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({x for e in edges for x in e})
    n = len(nodes)
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    cash = {v: 1.0 for v in nodes}
    hist = {v: 0.0 for v in nodes}
    for _ in range(rounds):
        dang = sum(c for v, c in cash.items() if v not in out)
        nxt = {v: 0.0 for v in nodes}
        for u, targets in out.items():
            for t in targets:
                nxt[t] += cash[u] / len(targets)
        for v in nodes:
            hist[v] += cash[v]
        cash = {v: nxt[v] + dang / n for v in nodes}
    total = n * (rounds + 1)
    return {
        v: (round(hist[v], 6), round(cash[v], 6), round((hist[v] + cash[v]) / total, 6))
        for v in nodes
    }


def _spark_opic(spark, edges, rounds=5):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    rows = opic(df, rounds=rounds).collect()
    return {r["node"]: (r["history"], r["cash"], r["importance"]) for r in rows}


def test_python_replay_parity(spark):
    rng = random.Random(31)
    edges = list({(rng.randrange(15), rng.randrange(15)) for _ in range(40)})
    edges = [(u, v) for u, v in edges if u != v]
    got = _spark_opic(spark, edges)
    want = _py_opic(edges)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_cash_conserved_and_importance_sums_to_one(spark):
    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]  # 3 is dangling
    got = _spark_opic(spark, edges, rounds=6)
    # outputs are rounded to 6dp, so the invariants hold to ~n ulps of 1e-6
    assert sum(c for _, c, _ in got.values()) == pytest.approx(4.0, abs=5e-6)
    assert sum(i for _, _, i in got.values()) == pytest.approx(1.0, abs=5e-6)


def test_sink_hub_accumulates(spark):
    # everything points at the hub; hub is dangling -> redistribution
    edges = [(i, 9) for i in range(1, 5)]
    got = _spark_opic(spark, edges, rounds=4)
    assert got[9][2] == max(i for _, _, i in got.values())


def _spark_modularity(spark, edges, mem):
    e = spark.createDataFrame(edges, "src: long, dst: long")
    m = spark.createDataFrame(mem, "node: long, community: long")
    rows = modularity(e, m).collect()
    return {r["community"]: (r["n_nodes"], r["intra_edges"], r["deg_sum"],
                             r["q_contrib"]) for r in rows}


def test_two_cliques_high_modularity(spark):
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges += [(10 + a, 10 + b) for a in range(4) for b in range(4) if a < b]
    edges.append((0, 10))
    mem = [(i, 0) for i in range(4)] + [(10 + i, 10) for i in range(4)]
    got = _spark_modularity(spark, edges, mem)
    # m = 13; each clique: intra 6, deg_sum 13 (one bridge endpoint +1)
    q = sum(v[3] for v in got.values())
    assert q == pytest.approx(2 * (6 / 13 - (13 / 26) ** 2), abs=1e-5)
    assert all(v[3] > 0.2 for v in got.values())


def test_single_community_q_is_zero(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    mem = [(0, 7), (1, 7), (2, 7)]
    got = _spark_modularity(spark, edges, mem)
    # all edges intra, deg_sum = 2m: Q = 1 - 1 = 0
    assert got[7][3] == pytest.approx(0.0, abs=1e-9)


def test_matches_networkx_formula(spark):
    rng = random.Random(9)
    edges = list({(rng.randrange(12), rng.randrange(12)) for _ in range(30)})
    edges = [(u, v) for u, v in edges if u != v]
    und = {(min(u, v), max(u, v)) for u, v in edges}
    mem = [(i, i % 3) for i in range(12)]
    cat = dict(mem)
    m = len(und)
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    want = 0.0
    for c in {0, 1, 2}:
        intra = sum(1 for a, b in und if cat[a] == c and cat[b] == c)
        dc = sum(d for v, d in deg.items() if cat[v] == c)
        want += intra / m - (dc / (2 * m)) ** 2
    got = _spark_modularity(spark, edges, mem)
    assert sum(v[3] for v in got.values()) == pytest.approx(want, abs=1e-5)
