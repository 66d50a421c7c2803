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


def test_hits_python_parity_and_structure(spark):
    import math

    from spanluke_spark.graph.pagerank import hits

    edges = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a3"), ("x", "h1")]

    def ref_hits(edges, iters):
        e = sorted(set(edges))
        nodes = sorted({n for p in e for n in p})
        hub = {n: 1.0 for n in nodes}
        auth = None
        for _ in range(iters):
            auth = {n: 0.0 for n in nodes}
            for s, d in e:
                auth[d] += hub[s]
            nn = math.sqrt(sum(v * v for v in auth.values()))
            auth = {n: v / nn for n, v in auth.items()}
            hub = {n: 0.0 for n in nodes}
            for s, d in e:
                hub[s] += auth[d]
            nn = math.sqrt(sum(v * v for v in hub.values()))
            hub = {n: v / nn for n, v in hub.items()}
        return hub, auth

    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(to_df(spark, edges), 2).collect()}
    rh, ra = ref_hits(edges, 2)
    for n in rh:
        assert got[n][0] == pytest.approx(rh[n], abs=1e-9)
        assert got[n][1] == pytest.approx(ra[n], abs=1e-9)
    # structure: a1 (pointed at by both hubs) is the top authority; h1/h2 top hubs
    assert max(ra, key=ra.get) == "a1"
    assert got["a1"][1] > got["a2"][1] and got["h1"][0] > got["a1"][0]


def test_anchor_alias_table_bounded_topk(spark):
    from spanluke_spark.graph.links import anchor_alias_table

    rows = (
        [("s%d" % i, "t1", "Apple Inc") for i in range(5)]
        + [("s%d" % i, "t1", "AAPL") for i in range(3)]
        + [("s9", "t1", "apple")]
        + [("s%d" % i, "t1", "alias%d" % i) for i in range(10, 16)]
        + [("s1", "t2", "  ")]  # whitespace-only anchors dropped
    )
    df = spark.createDataFrame(rows, "src string, dst string, anchor string")
    out = {r["dst"]: r["aliases"] for r in anchor_alias_table(df, top_k=3).collect()}
    t1 = [(a["anchor"], a["n_refs"]) for a in out["t1"]]
    assert t1 == [("Apple Inc", 5), ("AAPL", 3), ("alias10", 1)]  # capped at 3, det. tie-break
    assert "t2" not in out  # only blank anchors -> no alias row


def test_extract_anchor_texts_pairs(spark):
    from spanluke_spark.graph.links import extract_anchor_texts

    html = b'<html><a href="u1">One</a><p>noise</p><a href="u2" class="z">Two words</a></html>'
    df = spark.createDataFrame([("p", bytearray(html))], "url string, html binary")
    got = sorted(map(tuple, extract_anchor_texts(df).collect()))
    assert got == [("p", "u1", "One"), ("p", "u2", "Two words")]


def test_clustering_coefficient_hand_computed(spark):
    from spanluke_spark.graph.analytics import clustering_coefficient

    # triangle 0-1-2 plus pendant 2-3
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    got = {r.node: (r.deg, r.triangles, r.coefficient)
           for r in clustering_coefficient(e).collect()}
    assert got[0] == (2, 1, 1.0)
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (3, 1, round(1 / 3, 6))
    assert got[3] == (1, 0, 0.0)  # degree-1: defined as 0


def test_clustering_coefficient_clique(spark):
    from spanluke_spark.graph.analytics import clustering_coefficient

    clique = [(i, j) for i in range(4) for j in range(4) if i < j]
    e = spark.createDataFrame(clique, "src long, dst long")
    got = {r.node: r.coefficient for r in clustering_coefficient(e).collect()}
    assert all(c == 1.0 for c in got.values())


def ref_k_truss(edges, k):
    """Sequential-peel reference: simultaneous under-supported edge
    removal until fixpoint; returns {canonical_edge: final_support}."""
    und = und_set(edges)
    while True:
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {(a, b): len(adj[a] & adj[b]) for a, b in und}
        drop = {e for e in und if sup[e] < k - 2}
        if not drop:
            return sup
        und -= drop


def test_k_truss_clique_closed_form(spark):
    from spanluke_spark.graph.analytics import k_truss

    # K6: every edge has support 4, so the truss is all of K6 for
    # k <= 6 and empty for k = 7 (peeling everything at once)
    clique = [(f"n{i}", f"n{j}") for i in range(6) for j in range(6) if i < j]
    got = {(r.a, r.b): r.support for r in k_truss(to_df(spark, clique), 6).collect()}
    assert got == {tuple(sorted(e)): 4 for e in clique}
    assert k_truss(to_df(spark, clique), 7).count() == 0


def test_k_truss_core_vs_periphery(spark):
    from spanluke_spark.graph.analytics import k_truss

    # K5 core + pendant path + a hanging triangle: at k=4 only the K5
    # survives (path edges have support 0, triangle edges support 1)
    k5 = [(f"c{i}", f"c{j}") for i in range(5) for j in range(5) if i < j]
    extra = [("c0", "p1"), ("p1", "p2"), ("c1", "t1"), ("c1", "t2"), ("t1", "t2")]
    out = {(r.a, r.b): r.support
           for r in k_truss(to_df(spark, k5 + extra), 4).collect()}
    assert out == {tuple(sorted(e)): 3 for e in k5}
    # at k=3 the hanging triangle (support 1 >= 1) survives too
    out3 = {(r.a, r.b) for r in k_truss(to_df(spark, k5 + extra), 3).collect()}
    assert out3 == {tuple(sorted(e)) for e in k5} | {("c1", "t1"), ("c1", "t2"), ("t1", "t2")}


def test_k_truss_random_parity(spark):
    from spanluke_spark.graph.analytics import k_truss

    rng = np.random.default_rng(192)
    for k in (3, 4, 5):
        edges = rand_edges(rng, 12, 70)
        got = {(r.a, r.b): r.support
               for r in k_truss(to_df(spark, edges), k).collect()}
        assert got == ref_k_truss(edges, k)


def test_k_truss_rejects_small_k(spark):
    from spanluke_spark.graph.analytics import k_truss

    with pytest.raises(ValueError):
        k_truss(to_df(spark, [("a", "b")]), 2)


def ref_densest_trace(edges):
    und = und_set(edges)
    sym = set()
    for a, b in und:
        sym.add((a, b))
        sym.add((b, a))
    rows = []
    rnd = 0
    while sym:
        deg = Counter(a for a, _ in sym)
        n, m2 = len(deg), len(sym)
        rows.append((rnd, n, m2 // 2, round((m2 / 2) / n, 6)))
        keep = {v for v, d in deg.items() if d * n > m2}
        sym = {(a, b) for a, b in sym if a in keep and b in keep}
        rnd += 1
    return rows


def test_densest_trace_random_parity(spark):
    from spanluke_spark.graph.analytics import densest_subgraph_trace

    rng = np.random.default_rng(202)
    for trial in range(3):
        edges = rand_edges(rng, 14, 60)
        got = [(r.round, r.n_nodes, r.n_edges, r.density)
               for r in densest_subgraph_trace(to_df(spark, edges))
               .orderBy("round").collect()]
        assert got == ref_densest_trace(edges), trial


def test_densest_finds_planted_clique(spark):
    from spanluke_spark.graph.analytics import densest_subgraph_trace

    # K8 (density 3.5) + long sparse path (density ~0.5 alone)
    k8 = [(f"c{i}", f"c{j}") for i in range(8) for j in range(8) if i < j]
    path = [(f"p{i}", f"p{i+1}") for i in range(30)]
    trace = [(r.round, r.density)
             for r in densest_subgraph_trace(to_df(spark, k8 + path))
             .orderBy("round").collect()]
    # the max-density round is the clique: 28/8 = 3.5
    assert max(d for _, d in trace) == 3.5
    # and it is NOT round 0 (the mixed graph is diluted by the path)
    assert trace[0][1] < 3.5
