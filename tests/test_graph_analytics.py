"""Graph analytics gates (graph/analytics.py): brute-force Python parity
on random directed graphs for degree-oriented triangle counting,
deterministic synchronous label propagation, and 2-hop path motifs —
plus planted-structure checks (a clique's closed-form triangle count, a
two-community barbell for LPA).
"""

from collections import Counter
from itertools import combinations

import numpy as np
import pytest

from spanluke_spark.graph.analytics import (
    label_propagation,
    path_motifs,
    triangle_count,
)


def rand_edges(rng, n_nodes, n_edges):
    e = rng.integers(0, n_nodes, (n_edges, 2))
    return [(f"n{a}", f"n{b}") for a, b in e]


def und_set(edges):
    return {tuple(sorted(p)) for p in edges if p[0] != p[1]}


def ref_triangles(edges):
    und = und_set(edges)
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = Counter()
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return dict(counts)


def ref_lpa(edges, iters):
    und = und_set(edges)
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    labels = {n: n for n in adj}
    for _ in range(iters):
        new = {}
        for n in adj:
            votes = Counter(labels[m] for m in adj[n])
            new[n] = min(
                (lab for lab, c in votes.items() if c == max(votes.values()))
            )
        labels = new
    return labels


def ref_motifs(edges):
    e = set(edges)
    counts = Counter()
    for s, m in e:
        for m2, d in e:
            if m == m2 and s != d:
                counts[(s, d)] += 1
    return dict(counts)


def to_df(spark, edges):
    return spark.createDataFrame(edges, "src string, dst string")


def test_triangle_clique_closed_form(spark):
    # K6: every node sits in C(5,2) = 10 triangles
    edges = [(f"k{a}", f"k{b}") for a, b in combinations(range(6), 2)]
    got = {r["node"]: r["triangles"] for r in triangle_count(to_df(spark, edges)).collect()}
    assert got == {f"k{i}": 10 for i in range(6)}


def test_triangle_random_parity(spark):
    rng = np.random.default_rng(7)
    for trial in range(3):
        edges = rand_edges(rng, 14, 60)
        got = {
            r["node"]: r["triangles"]
            for r in triangle_count(to_df(spark, edges)).collect()
        }
        assert got == ref_triangles(edges), trial


def test_lpa_barbell_communities(spark):
    # two K4 cliques joined by one bridge edge: after 2 rounds each side
    # converges to its clique's min label
    left = [(f"a{i}", f"a{j}") for i, j in combinations(range(4), 2)]
    right = [(f"b{i}", f"b{j}") for i, j in combinations(range(4), 2)]
    edges = left + right + [("a0", "b0")]
    got = {r["node"]: r["label"] for r in label_propagation(to_df(spark, edges), 2).collect()}
    assert got == ref_lpa(edges, 2)
    assert all(got[f"a{i}"].startswith("a") for i in range(1, 4))
    assert all(got[f"b{i}"].startswith("b") for i in range(1, 4))


def test_lpa_random_parity(spark):
    rng = np.random.default_rng(3)
    for trial in range(3):
        edges = rand_edges(rng, 12, 40)
        for iters in (1, 2):
            got = {
                r["node"]: r["label"]
                for r in label_propagation(to_df(spark, edges), iters).collect()
            }
            assert got == ref_lpa(edges, iters), (trial, iters)


def test_motifs_random_parity(spark):
    rng = np.random.default_rng(11)
    for trial in range(3):
        edges = rand_edges(rng, 10, 35)
        got = {
            (r["src"], r["dst"]): r["n_paths"]
            for r in path_motifs(to_df(spark, edges)).collect()
        }
        assert got == ref_motifs(set(edges)), trial


def test_motifs_excludes_round_trips(spark):
    # a->b->a must not appear (src == dst); a->b->c must
    got = path_motifs(to_df(spark, [("a", "b"), ("b", "a"), ("b", "c")])).collect()
    pairs = {(r["src"], r["dst"]): r["n_paths"] for r in got}
    assert pairs == {("a", "c"): 1}


def test_transitive_closure_parity_and_doubling(spark):
    from spanluke_spark.graph.closure import transitive_closure

    def ref_closure(edges):
        adj = {}
        for a, b in set(edges):
            if a != b:
                adj.setdefault(a, set()).add(b)
        out = set()
        for s in adj:
            stack, seen = list(adj[s]), set()
            while stack:
                v = stack.pop()
                if v in seen:
                    continue
                seen.add(v)
                stack.extend(adj.get(v, ()))
            out.update((s, v) for v in seen)
        return out

    # long chain (diameter 40 >> 2^rounds for naive-at-20) proves doubling
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(40)]
    got = {
        (r["src"], r["dst"])
        for r in transitive_closure(to_df(spark, chain), max_rounds=7).collect()
    }
    assert got == ref_closure(chain)  # 7 doubling rounds cover 2^7 >= 40

    rng = np.random.default_rng(23)
    for trial in range(2):
        edges = rand_edges(rng, 10, 18)  # sparse; may contain cycles
        got = {
            (r["src"], r["dst"])
            for r in transitive_closure(to_df(spark, edges)).collect()
        }
        assert got == ref_closure(edges), trial
