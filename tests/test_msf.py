"""Gates for Borůvka MSF / single-linkage (graph/msf.py): Kruskal parity
with the same (w, a, b) tie-break on random weighted graphs (the forest
is unique under that total order, so the comparison is exact edge-set
equality), forest-size invariant |F| = |V| - #components, tie-heavy
determinism, and single-linkage == brute-force components of the
thresholded graph at several thresholds.
"""

import numpy as np
import pytest

from spanluke_spark.graph.msf import boruvka_msf, single_linkage


def canonical(edges):
    best = {}
    for s, d, w in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        best[(a, b)] = min(w, best.get((a, b), float("inf")))
    return best


def kruskal(edges):
    """MSF with ties broken by (w, a, b) — the msf.py total order."""
    best = canonical(edges)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest


def ref_components(edges, threshold):
    best = canonical(edges)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = {n for s, d, _ in edges for n in (s, d)}
    for n in nodes:
        find(n)
    for (a, b), w in best.items():
        if w <= threshold:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
    groups = {}
    for n in nodes:
        groups.setdefault(find(n), []).append(n)
    return {n: min(g) for g in groups.values() for n in g}


def rand_edges(rng, n_nodes, n_edges, max_w=12):
    raw = rng.integers(0, n_nodes, (n_edges, 2))
    ws = rng.integers(1, max_w, n_edges)
    return [(int(a), int(b), float(w)) for (a, b), w in zip(raw, ws)]


def test_msf_kruskal_parity_random(spark):
    rng = np.random.default_rng(206)
    for n_nodes, n_edges in ((10, 25), (20, 60), (30, 40)):
        edges = rand_edges(rng, n_nodes, n_edges)
        df = spark.createDataFrame(edges, ["src", "dst", "w"])
        st = {}
        got = {tuple(r) for r in boruvka_msf(df, stats=st).collect()}
        ref = kruskal(edges)
        assert got == ref
        # forest-size invariant: |F| = |V| - #components
        comps = len(set(ref_components(edges, float("inf")).values()))
        nodes = {n for s, d, _ in edges if s != d for n in (s, d)}
        assert len(got) == len(nodes) - comps
        assert st["rounds"] <= int(np.ceil(np.log2(st["n_nodes"] + 1)))


def test_msf_all_ties_deterministic(spark):
    # every weight identical: the (w, a, b) order still yields ONE forest
    edges = [(a, b, 1.0) for a in range(6) for b in range(a + 1, 6)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    runs = [frozenset(map(tuple, boruvka_msf(df).collect())) for _ in range(2)]
    assert runs[0] == runs[1] == frozenset(kruskal(edges))
    assert len(runs[0]) == 5


def test_msf_total_weight_minimal(spark):
    rng = np.random.default_rng(77)
    edges = rand_edges(rng, 12, 40)
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got_w = sum(r["w"] for r in boruvka_msf(df).collect())
    ref_w = sum(w for _, _, w in kruskal(edges))
    assert got_w == pytest.approx(ref_w)


def test_single_linkage_matches_threshold_components(spark):
    rng = np.random.default_rng(1206)
    edges = rand_edges(rng, 25, 70)
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    for t in (0.0, 3.0, 6.5, 100.0):
        got = {r["node"]: r["cluster"] for r in single_linkage(df, t).collect()}
        assert got == ref_components(edges, t)


def test_single_linkage_self_loop_only_node(spark):
    edges = [(1, 2, 1.0), (9, 9, 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    got = {r["node"]: r["cluster"] for r in single_linkage(df, 5.0).collect()}
    assert got == {1: 1, 2: 1, 9: 9}
