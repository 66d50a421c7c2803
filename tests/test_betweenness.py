"""Brandes betweenness — closed forms (path, star), Python Brandes
brute-force parity on random graphs (full horizon AND truncated
horizon), the directed variant, and sampled-sources consistency."""

from __future__ import annotations

import random
from collections import defaultdict, deque

import pytest

from spanluke_spark.graph.centrality import betweenness


def _py_brandes(edges, depth, undirected=True, sources=None):
    adj = defaultdict(set)
    for a, b in edges:
        if a == b:
            continue
        adj[a].add(b)
        if undirected:
            adj[b].add(a)
    nodes = set(adj) | {b for vs in adj.values() for b in vs}
    bc = defaultdict(float)
    for s in sources if sources is not None else nodes:
        dist, sigma = {s: 0}, {s: 1.0}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            if dist[u] >= depth:
                continue
            for v in sorted(adj[u]):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    sigma[v] = 0.0
                    order.append(v)
                    q.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
        delta = defaultdict(float)
        for v in reversed(order):
            for u in sorted(adj[v]) if undirected else [
                u for u in adj if v in adj[u]
            ]:
                if u in dist and dist[u] == dist[v] - 1:
                    delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if v != s:
                bc[v] += delta[v]
    scale = 2.0 if undirected else 1.0
    return {n: round(bc[n] / scale, 6) for n in nodes if n in bc or True}


def _spark_bc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        r["node"]: r["betweenness"] for r in betweenness(df, **kw).collect()
    }


def test_path_and_star_closed_forms(spark):
    path = [(i, i + 1) for i in range(4)]
    assert _spark_bc(spark, path, max_depth=6) == {
        0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0,
    }
    star = [(0, j) for j in range(1, 6)]
    got = _spark_bc(spark, star, max_depth=3)
    assert got[0] == 10.0 and all(got[j] == 0.0 for j in range(1, 6))


@pytest.mark.parametrize("seed,n,m,depth", [(1, 18, 30, 6), (3, 25, 40, 3)])
def test_matches_python_brandes(spark, seed, n, m, depth):
    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
    got = _spark_bc(spark, edges, max_depth=depth)
    want = _py_brandes(edges, depth)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_directed(spark):
    # directed path 0->1->2->3: interior nodes broker (s,t) pairs one way
    edges = [(0, 1), (1, 2), (2, 3)]
    got = _spark_bc(spark, edges, max_depth=5, undirected=False)
    assert got[1] == 2.0 and got[2] == 2.0 and got[3] == 0.0


def test_sampled_sources_subset(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(25)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    srcs = spark.createDataFrame([(0,), (5,), (9,)], "node: long")
    got = {
        r["node"]: r["betweenness"]
        for r in betweenness(df, sources=srcs, max_depth=4).collect()
    }
    want = _py_brandes(edges, 4, sources=[0, 5, 9])
    for k in got:
        assert got[k] == pytest.approx(want.get(k, 0.0), abs=2e-6)
