"""Directed-triangle patterns (graph/triads.py) and adjusted Rand
(evaluation/rand.py) gates: hand-built cycle/transitive anchors with
reciprocal-edge multi-pattern semantics pinned, brute Python replay;
ARI identity = 1, independence ~ 0, sklearn-formula Python replay,
singleton-degenerate NULL and the item-cap guard."""

from __future__ import annotations

from itertools import permutations

import pytest

from spanluke_spark.evaluation.rand import MAX_ITEMS, adjusted_rand
from spanluke_spark.graph.triads import directed_triangles


def py_triangles(edges):
    e = {(s, d) for s, d in edges if s != d}
    cyc = tra = 0
    nodes = {x for p in e for x in p}
    for a, b, c in permutations(sorted(nodes), 3):
        if (a, b) in e and (b, c) in e:
            if (c, a) in e and a < b and a < c:
                cyc += 1
            if (a, c) in e:
                tra += 1
    return cyc, tra


def test_directed_triangles_anchors(spark):
    # one pure cycle, one pure transitive triple
    edges = [("a", "b"), ("b", "c"), ("c", "a"),
             ("x", "y"), ("y", "z"), ("x", "z")]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = directed_triangles(df).collect()[0]
    assert (r["cyclic"], r["transitive"]) == (1, 1)
    assert r["hierarchy_ppm"] == 500_000


def test_directed_triangles_reciprocal_multi_pattern(spark):
    # fully reciprocal triangle: every rotation cyclic once (min-label
    # dedup -> 2 orientations), every ordered triple transitive
    edges = [(a, b) for a in "abc" for b in "abc" if a != b]
    df = spark.createDataFrame(edges, "src string, dst string")
    r = directed_triangles(df).collect()[0]
    cyc, tra = py_triangles(edges)
    assert (r["cyclic"], r["transitive"]) == (cyc, tra)
    assert r["cyclic"] == 2 and r["transitive"] == 6


def test_directed_triangles_matches_python_on_modulus_graph(spark):
    edges = [(m % 17, (m * 3 + 1) % 17) for m in range(40)] + [
        (m % 17, (m + 5) % 17) for m in range(40)
    ]
    df = spark.createDataFrame(edges, "src int, dst int")
    r = directed_triangles(df).collect()[0]
    assert (r["cyclic"], r["transitive"]) == py_triangles(edges)


def py_ari(pairs):
    from collections import Counter

    cells = Counter(pairs)
    ca = Counter(a for a, _ in pairs)
    cb = Counter(b for _, b in pairs)
    p2 = lambda c: c * (c - 1) // 2
    n = len(pairs)
    pn = p2(n)
    s_cells = sum(p2(c) for c in cells.values())
    s_a = sum(p2(c) for c in ca.values())
    s_b = sum(p2(c) for c in cb.values())
    num2 = 2 * (pn * s_cells - s_a * s_b)
    den2 = pn * (s_a + s_b) - 2 * s_a * s_b
    if den2 == 0:
        ari = None
    else:
        mag = (
            abs(num2) // (den2 // 1_000_000)
            if den2 >= 1_000_000
            else abs(num2) * 1_000_000 // den2
        )
        ari = -mag if num2 < 0 else mag
    ri = (pn - s_a - s_b + 2 * s_cells) * 1_000_000 // pn
    return s_cells, s_a, s_b, ri, ari


def ari_df(spark, pairs):
    rows = [(i, a, b) for i, (a, b) in enumerate(pairs)]
    return spark.createDataFrame(rows, "id long, a string, b string")


def test_ari_identity_and_independence(spark):
    ident = [(f"c{i % 4}", f"k{i % 4}") for i in range(40)]
    r = adjusted_rand(ari_df(spark, ident)).collect()[0]
    assert r["ari_ppm"] == 1_000_000 and r["ri_ppm"] == 1_000_000
    # independent crossed partitions: ARI near 0 (a balanced cross
    # design lands slightly NEGATIVE of the expected index), RI high
    indep = [(f"c{i % 4}", f"k{i % 5}") for i in range(40)]
    r = adjusted_rand(ari_df(spark, indep)).collect()[0]
    assert -150_000 < r["ari_ppm"] < 50_000
    want = py_ari(indep)
    assert (
        r["sum_pair_cells"],
        r["sum_pair_a"],
        r["sum_pair_b"],
        r["ri_ppm"],
        r["ari_ppm"],
    ) == want


def test_ari_replay_and_degenerate(spark):
    mixed = [(f"c{(i * 7) % 3}", f"k{(i * i) % 4}") for i in range(60)]
    r = adjusted_rand(ari_df(spark, mixed)).collect()[0]
    assert (
        r["sum_pair_cells"],
        r["sum_pair_a"],
        r["sum_pair_b"],
        r["ri_ppm"],
        r["ari_ppm"],
    ) == py_ari(mixed)
    # both partitions all singletons -> den2 = 0 -> NULL ARI, RI = 1
    singl = [(f"a{i}", f"b{i}") for i in range(10)]
    r = adjusted_rand(ari_df(spark, singl)).collect()[0]
    assert r["ari_ppm"] is None and r["ri_ppm"] == 1_000_000


def test_ari_item_cap(spark):
    df = spark.range(MAX_ITEMS + 1).selectExpr(
        "id", "'a' as a", "'b' as b"
    )
    with pytest.raises(ValueError):
        adjusted_rand(df)
