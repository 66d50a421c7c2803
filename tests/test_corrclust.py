"""Correlation clustering (parallel pivot) — Python replay parity on
random graphs, the star/independence structural invariants, the
no-transitive-merge contract vs connected components, the disagreement
objective vs brute force, and determinism across partitionings."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from spanluke_spark.canon.corrclust import (
    clustering_disagreements,
    pivot_clusters,
)

P, A, B = 100003, 737, 11


def _pri(v: int) -> int:
    return (v * A + B) % P


def _py_pivot(edges: list[tuple[int, int]], rounds: int = 40) -> dict[int, int]:
    """Driver-side replay of the exact parallel-pivot contract."""
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    out: dict[int, int] = {}
    for _ in range(rounds):
        if not active:
            break
        pivots = {
            v
            for v in active
            if all(_pri(v) < _pri(u) for u in adj[v] if u in active)
        }
        asg: dict[int, int] = {p: p for p in pivots}
        for v in active - pivots:
            near = [p for p in adj[v] if p in active and p in pivots]
            if near:
                asg[v] = min(near, key=_pri)
        out.update(asg)
        active -= set(asg)
    return out


def _spark_clusters(spark, edges, rounds=40, parts=None):
    df = spark.createDataFrame(edges, "a: long, b: long")
    if parts:
        df = df.repartition(parts)
    res = pivot_clusters(
        df, rounds=rounds, priority_fn=lambda c: (c * A + B) % P
    )
    return {r["node"]: r["cluster"] for r in res.collect()}


def _rand_edges(seed: int, n: int, m: int) -> list[tuple[int, int]]:
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


@pytest.mark.parametrize("seed,n,m", [(1, 40, 80), (2, 120, 200), (3, 25, 24)])
def test_pivot_matches_python_replay(spark, seed, n, m):
    edges = _rand_edges(seed, n, m)
    got = _spark_clusters(spark, edges)
    want = _py_pivot(edges)
    assert got == want and len(got) > 0


def test_structural_invariants(spark):
    """Pivots form an independent set; every member is adjacent to its
    pivot (clusters are radius-1 stars, never closure chains)."""
    edges = _rand_edges(7, 60, 120)
    got = _spark_clusters(spark, edges)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    pivots = {c for c in got.values()}
    for node, cl in got.items():
        if node != cl:
            assert cl in adj[node]  # star membership
    for p in pivots:
        # adjacent pivots must have been clustered in DIFFERENT rounds —
        # verify the weaker always-true invariant: a pivot's own cluster
        # is itself.
        assert got[p] == p


def test_no_transitive_merge_on_a_path(spark):
    """A 5-node path collapses to >= 2 clusters (CC would give exactly 1):
    the whole point of pivot clustering for noisy match graphs."""
    path = [(i, i + 1) for i in range(5)]
    got = _spark_clusters(spark, path)
    assert len(got) == 6
    assert len(set(got.values())) >= 2


def test_determinism_across_partitionings(spark):
    edges = _rand_edges(11, 80, 150)
    assert _spark_clusters(spark, edges, parts=1) == _spark_clusters(
        spark, edges, parts=7
    )


def test_disagreements_vs_bruteforce(spark):
    edges = _rand_edges(13, 30, 60)
    neg = _rand_edges(14, 30, 40)
    got = _spark_clusters(spark, edges)
    pos_df = spark.createDataFrame(edges, "a: long, b: long")
    neg_df = spark.createDataFrame(neg, "a: long, b: long")
    cl_df = spark.createDataFrame(
        list(got.items()), "node: long, cluster: long"
    )
    row = clustering_disagreements(pos_df, neg_df, cl_df).collect()[0]

    def canon(pairs):
        return {(min(a, b), max(a, b)) for a, b in pairs if a != b}

    pos_cut = sum(
        1
        for (u, v) in canon(edges)
        if u in got and v in got and got[u] != got[v]
    )
    neg_inside = sum(
        1
        for (u, v) in canon(neg)
        if u in got and v in got and got[u] == got[v]
    )
    assert (row["pos_cut"], row["neg_inside"], row["disagreements"]) == (
        pos_cut,
        neg_inside,
        pos_cut + neg_inside,
    )


def test_fixture_converges_within_unrolled_rounds(spark, sf_dir):
    """q210's oracle unrolls 8 rounds — assert the fixture graph actually
    clusters every node within 8 (the Spark side must not silently omit
    stragglers the SQL side would also omit)."""
    import __spark_entry__ as entrymod

    res = entrymod.extra_queries()["q210_corr_clustering"](spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d = F.col("doc_id")
    g1 = docs.select((d % 240).alias("a"), ((d * 31 + 7) % 240).alias("b"))
    g2 = docs.filter(d % 5 < 2).select(
        ((d * 13 + 5) % 240).alias("a"), ((d * 57 + 13) % 240).alias("b")
    )
    sym = g1.unionByName(g2).filter(F.col("a") != F.col("b"))
    n_nodes = (
        sym.select(F.col("a").alias("n"))
        .unionByName(sym.select(F.col("b").alias("n")))
        .distinct()
        .count()
    )
    assert res.count() == n_nodes
