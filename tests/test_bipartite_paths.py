"""Gates for the two session-9 graph lanes: butterfly counting
(graph/bipartite.py) — closed form on K_{3,3}, brute-force parity on
random bipartite graphs, stats/per-node consistency, pivot-side
invariance — and bounded Bellman-Ford SSSP (graph/paths.py) — Python
hop-bounded relaxation parity on random weighted digraphs, parallel-edge
collapse, multi-source min semantics, hop-count mode.
"""

from collections import defaultdict
from itertools import combinations

import numpy as np
import pytest

from spanluke_spark.graph.bipartite import (
    butterfly_counts,
    butterfly_stats,
    k_wing,
)
from spanluke_spark.graph.paths import earliest_arrival, sssp


def ref_butterflies(edges):
    """Per-left-node butterfly counts by direct pair enumeration."""
    nbrs = defaultdict(set)
    for l, r in set(edges):
        nbrs[l].add(r)
    counts = defaultdict(int)
    for u, v in combinations(sorted(nbrs), 2):
        c = len(nbrs[u] & nbrs[v])
        if c >= 2:
            bf = c * (c - 1) // 2
            counts[u] += bf
            counts[v] += bf
    return dict(counts)


def ref_total(edges):
    return sum(ref_butterflies(edges).values()) // 2


def ref_sssp(edges, seeds, rounds):
    """Hop-bounded multi-source Bellman-Ford, parallel edges -> min w."""
    best = {}
    for s, d, w in edges:
        best[(s, d)] = min(w, best.get((s, d), float("inf")))
    dist = {s: 0.0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for (s, d), w in best.items():
            if s in dist and dist[s] + w < nxt.get(d, float("inf")):
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_k33_closed_form(spark):
    edges = [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)]
    df = spark.createDataFrame(edges, ["left", "right"])
    stats = butterfly_stats(df).collect()[0]
    # C(3,2) * C(3,2) = 9 butterflies in K_{3,3}
    assert stats["n_butterflies"] == 9
    assert (stats["n_left"], stats["n_right"], stats["n_edges"]) == (3, 3, 9)
    per = {r["node"]: r["butterflies"] for r in butterfly_counts(df).collect()}
    # each left node: 2 pairs x C(3,2) = 6 memberships
    assert per == {"l0": 6, "l1": 6, "l2": 6}


def test_butterflies_random_parity(spark):
    rng = np.random.default_rng(409)
    for _ in range(4):
        edges = [
            (f"l{a}", f"r{b}")
            for a, b in rng.integers(0, 8, (60, 2))
        ]
        df = spark.createDataFrame(edges, ["left", "right"])
        ref = ref_butterflies(edges)
        got = {r["node"]: r["butterflies"] for r in butterfly_counts(df).collect()}
        assert got == ref
        total = butterfly_stats(df).collect()[0]["n_butterflies"]
        assert total == ref_total(edges)
        # right-side counts must see the SAME butterflies (each butterfly
        # has 2 right members, so totals agree)
        right = butterfly_counts(df, side="right").collect()
        assert sum(r["butterflies"] for r in right) == 2 * total


def test_butterflies_duplicate_edges_ignored(spark):
    edges = [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)]
    df = spark.createDataFrame(edges * 3, ["left", "right"])
    assert butterfly_stats(df).collect()[0]["n_butterflies"] == 9


def test_butterflies_skewed_side_pivot(spark):
    # one hub right-node connected to every left node, plus a K_{2,2}:
    # pivot probe must still produce the exact count (1 butterfly needs
    # codeg >= 2; the hub alone creates pairs with codeg 1 -> 0)
    edges = [(f"l{i}", "rhub") for i in range(30)]
    edges += [("l0", "r1"), ("l0", "r2"), ("l1", "r1"), ("l1", "r2")]
    df = spark.createDataFrame(edges, ["left", "right"])
    # pairs (l0,l1): co-neighbors {rhub, r1, r2} = 3 -> C(3,2) = 3;
    # every other pair shares only rhub -> 0
    assert butterfly_stats(df).collect()[0]["n_butterflies"] == 3


def ref_edge_support(edges):
    """Per-edge butterfly support by direct enumeration."""
    nbrs = defaultdict(set)
    for l, r in set(edges):
        nbrs[l].add(r)
    sup = defaultdict(int)
    for u, v in combinations(sorted(nbrs), 2):
        common = nbrs[u] & nbrs[v]
        c = len(common)
        if c >= 2:
            for x in common:
                sup[(u, x)] += c - 1
                sup[(v, x)] += c - 1
    return dict(sup)


def ref_k_wing(edges, k):
    """Simultaneous peel to fixpoint, final supports recomputed."""
    e = set(edges)
    while True:
        sup = ref_edge_support(e)
        kept = {uv for uv in e if sup.get(uv, 0) >= k}
        if kept == e:
            break
        e = kept
    sup = ref_edge_support(e)
    return {uv: s for uv, s in sup.items() if uv in e and s >= k}


def test_k_wing_closed_form_k33(spark):
    # K_{3,3} + pendant: every core edge in 2*2 = 4 butterflies
    edges = [(f"l{i}", f"r{j}") for i in range(3) for j in range(3)]
    edges.append(("l9", "r0"))
    df = spark.createDataFrame(edges, ["left", "right"])
    got = {(r["l"], r["r"]): r["support"] for r in k_wing(df, 4).collect()}
    assert got == {(f"l{i}", f"r{j}"): 4 for i in range(3) for j in range(3)}
    assert k_wing(df, 5).count() == 0


def test_k_wing_random_parity(spark):
    rng = np.random.default_rng(208)
    for _ in range(3):
        edges = [
            (f"l{a}", f"r{b}") for a, b in rng.integers(0, 6, (40, 2))
        ]
        df = spark.createDataFrame(edges, ["left", "right"])
        for k in (1, 3, 6):
            ref = ref_k_wing(edges, k)
            got = {
                (r["l"], r["r"]): r["support"]
                for r in k_wing(df, k).collect()
            }
            assert got == ref


def test_k_wing_cascade_peel(spark):
    # chain of overlapping K_{2,2}s: the tail squares depend on each
    # other, so peeling at k=2 cascades over multiple rounds
    edges = []
    for i in range(5):
        edges += [
            (f"l{i}", f"r{i}"), (f"l{i}", f"r{i+1}"),
            (f"l{i+1}", f"r{i}"), (f"l{i+1}", f"r{i+1}"),
        ]
    df = spark.createDataFrame(edges, ["left", "right"])
    got = {(r["l"], r["r"]): r["support"] for r in k_wing(df, 2).collect()}
    assert got == ref_k_wing(edges, 2)


def test_sssp_random_parity(spark):
    rng = np.random.default_rng(1105)
    for _ in range(3):
        raw = rng.integers(0, 12, (80, 2))
        ws = rng.integers(1, 9, 80)
        edges = [
            (f"n{a}", f"n{b}", float(w))
            for (a, b), w in zip(raw, ws)
            if a != b
        ]
        df = spark.createDataFrame(edges, ["src", "dst", "w"])
        seeds = spark.createDataFrame([("n0",), ("n3",)], ["node"])
        for rounds in (1, 3, 6):
            ref = ref_sssp(edges, ["n0", "n3"], rounds)
            got = {
                r["node"]: r["dist"]
                for r in sssp(df, seeds, rounds=rounds, weight="w").collect()
            }
            assert got == pytest.approx(ref)


def test_sssp_parallel_edges_take_min(spark):
    edges = [("a", "b", 9.0), ("a", "b", 2.0), ("b", "c", 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"] for r in sssp(df, seeds, rounds=2, weight="w").collect()}
    assert got == {"a": 0.0, "b": 2.0, "c": 3.0}


def test_sssp_hop_count_mode_and_bound(spark):
    # chain a->b->c->d; hop mode (weight=None) counts edges; rounds=2
    # must NOT reach d
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    df = spark.createDataFrame(edges, ["src", "dst"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    two = {r["node"]: r["dist"] for r in sssp(df, seeds, rounds=2).collect()}
    assert two == {"a": 0.0, "b": 1.0, "c": 2.0}
    three = {r["node"]: r["dist"] for r in sssp(df, seeds, rounds=3).collect()}
    assert three["d"] == 3.0


def ref_earliest(edges, seeds, rounds, start=0.0):
    """Jacobi earliest-arrival relaxation — mirrors the unrolled oracle."""
    arr = {s: start for s in seeds}
    e = sorted(set(edges))
    for _ in range(rounds):
        nxt = dict(arr)
        for s, d, t in e:
            if s in arr and t >= arr[s] and t < nxt.get(d, float("inf")):
                nxt[d] = t
        arr = nxt
    return arr


def test_earliest_arrival_random_parity(spark):
    rng = np.random.default_rng(207)
    for _ in range(3):
        raw = rng.integers(0, 10, (70, 2))
        ts = rng.integers(0, 50, 70)
        edges = [
            (f"n{a}", f"n{b}", float(t))
            for (a, b), t in zip(raw, ts)
            if a != b
        ]
        df = spark.createDataFrame(edges, ["src", "dst", "t"])
        seeds = spark.createDataFrame([("n0",)], ["node"])
        for rounds in (1, 3, 5):
            ref = ref_earliest(edges, ["n0"], rounds)
            got = {
                r["node"]: r["arr"]
                for r in earliest_arrival(df, seeds, rounds=rounds).collect()
            }
            assert got == pytest.approx(ref)


def test_earliest_arrival_respects_time_order(spark):
    # a -> b at t=5, b -> c at t=3: c is NOT reachable time-respectingly
    # even though the flattened graph reaches it; b -> d at t=7 works
    edges = [("a", "b", 5.0), ("b", "c", 3.0), ("b", "d", 7.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "t"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["arr"] for r in earliest_arrival(df, seeds, rounds=3).collect()}
    assert got == {"a": 0.0, "b": 5.0, "d": 7.0}


def test_earliest_arrival_parallel_edges_all_live(spark):
    # the t=1 copy of b->c is unusable (arrive at b at t=4); the t=6
    # copy must still fire — weight-collapsing parallel edges would
    # wrongly kill it
    edges = [("a", "b", 4.0), ("b", "c", 1.0), ("b", "c", 6.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "t"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["arr"] for r in earliest_arrival(df, seeds, rounds=2).collect()}
    assert got == {"a": 0.0, "b": 4.0, "c": 6.0}


def test_earliest_arrival_start_gate(spark):
    # edges before the start time are dead
    edges = [("a", "b", 2.0), ("a", "b", 9.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "t"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["arr"] for r in earliest_arrival(df, seeds, rounds=1, start=5.0).collect()}
    assert got == {"a": 5.0, "b": 9.0}


def test_sssp_cycle_stays_bounded(spark):
    # a 2-cycle with a shortcut: bounded rounds terminate and keep mins
    edges = [("a", "b", 1.0), ("b", "a", 1.0), ("a", "c", 5.0), ("b", "c", 1.0)]
    df = spark.createDataFrame(edges, ["src", "dst", "w"])
    seeds = spark.createDataFrame([("a",)], ["node"])
    got = {r["node"]: r["dist"] for r in sssp(df, seeds, rounds=4, weight="w").collect()}
    assert got == {"a": 0.0, "b": 1.0, "c": 2.0}
