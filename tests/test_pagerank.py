"""Relational PageRank vs a pure-Python power-iteration oracle."""

from __future__ import annotations

from spanluke_spark.graph.links import extract_links
from spanluke_spark.graph.pagerank import pagerank


def _py_pagerank(edges, iters, d=0.85):
    nodes = sorted({n for e in edges for n in e})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in rank.items() if v not in outdeg)
        inflow = {v: 0.0 for v in nodes}
        for s, t in edges:
            inflow[t] += rank[s] / outdeg[s]
        base = (1 - d) / n + d * dangling / n
        rank = {v: base + d * inflow[v] for v in nodes}
    return rank


def test_pagerank_matches_python_with_dangling(spark):
    # 5 -> dangling sink; 1,2,3 cycle; 4 points into the cycle
    edges = [(1, 2), (2, 3), (3, 1), (4, 1), (4, 5), (1, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=4).collect()}
    want = _py_pagerank(edges, iters=4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved


def test_pagerank_parallel_edges_weighted(spark):
    # two parallel edges a->b double b's share relative to a->c
    edges = [("a", "b"), ("a", "b"), ("a", "c"), ("b", "a"), ("c", "a")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    want = _py_pagerank(edges, iters=3)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12
    assert got["b"] > got["c"]


def test_extract_links_order_and_dupes(spark):
    pages = spark.createDataFrame(
        [("p1", bytearray(b'<a href="x">1</a><a href="y">2</a><a href="x">3</a>'))],
        "url string, html binary",
    )
    got = [r["dst"] for r in extract_links(pages).collect()]
    assert got == ["x", "y", "x"]  # document order, duplicates kept
