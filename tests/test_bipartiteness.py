"""Bipartiteness audit — ground truth via Python BFS 2-coloring on
random graphs (is_bipartite must agree with the standard algorithm),
the clean two-mode case, a planted same-side edge, and the odd-cycle
witness count on cycles."""

from __future__ import annotations

import random
from collections import defaultdict, deque

from spanluke_spark.graph.analytics import bipartiteness


def _py_is_bipartite(edges):
    adj = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    color = {}
    verdict = {}
    for start in sorted(adj):
        if start in color:
            continue
        comp_nodes = []
        ok = True
        color[start] = 0
        q = deque([start])
        while q:
            u = q.popleft()
            comp_nodes.append(u)
            for v in adj[u]:
                if v not in color:
                    color[v] = color[u] ^ 1
                    q.append(v)
                elif color[v] == color[u]:
                    ok = False
        verdict[min(comp_nodes)] = (len(comp_nodes), ok)
    return verdict


def _spark_bip(spark, edges, rounds=10):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        r["component"]: (r["n_nodes"], r["n_conflicts"], r["is_bipartite"])
        for r in bipartiteness(df, rounds=rounds).collect()
    }


def test_verdict_matches_python_bfs_on_random_graphs(spark):
    for seed in (2, 11):
        rng = random.Random(seed)
        edges = [
            (rng.randrange(25), rng.randrange(25)) for _ in range(35)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        got = _spark_bip(spark, edges)
        want = _py_is_bipartite(edges)
        assert set(got) == set(want)
        for c in want:
            assert got[c][0] == want[c][0]
            assert got[c][2] == want[c][1], (seed, c)


def test_clean_two_mode_graph_passes(spark):
    edges = [(i, 100 + (i * 3) % 7) for i in range(20)]
    got = _spark_bip(spark, edges)
    assert all(v[2] for v in got.values())


def test_planted_same_side_edge_caught(spark):
    # docs 3 and 10 share host 102 ((3*3)%7 == (10*3)%7 == 2), so the
    # doc-doc edge closes a 3-cycle 3-102-10 — an odd-cycle witness
    edges = [(i, 100 + (i * 3) % 7) for i in range(20)] + [(3, 10)]
    got = _spark_bip(spark, edges)
    assert not all(v[2] for v in got.values())


def test_odd_cycle_has_exactly_one_witness(spark):
    got = _spark_bip(spark, [(i, (i + 1) % 7) for i in range(7)])
    assert got[0] == (7, 1, False)
    got_even = _spark_bip(spark, [(i, (i + 1) % 8) for i in range(8)])
    assert got_even[0] == (8, 0, True)
