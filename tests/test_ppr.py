"""Personalized PageRank — Python replay parity, mass conservation,
unreachable-is-zero, seed-mass locality, empty-seed contract, and the
uniform-seed reduction sanity check."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.graph.pagerank import pagerank, personalized_pagerank


def _py_ppr(edges, seeds, iters=3, d=0.85):
    agg = {}
    for u, v in edges:
        agg[(u, v)] = agg.get((u, v), 0) + 1
    nodes = sorted({x for e in agg for x in e} | set(seeds))
    seeds = set(seeds)
    p = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    outw = {}
    for (u, _v), w in agg.items():
        outw[u] = outw.get(u, 0) + w
    rank = dict(p)
    for _ in range(iters):
        dang = sum(r for v, r in rank.items() if v not in outw)
        inflow = {v: 0.0 for v in nodes}
        for (u, v), w in agg.items():
            inflow[v] += rank[u] / outw[u] * w
        rank = {v: (1 - d) * p[v] + d * dang * p[v] + d * inflow[v] for v in nodes}
    return rank


def _spark_ppr(spark, edges, seeds, iters=3):
    e = spark.createDataFrame(edges, "src: long, dst: long")
    s = spark.createDataFrame([(x,) for x in seeds], "node: long")
    return {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, s, iters=iters).collect()
    }


def test_python_replay_parity(spark):
    rng = random.Random(19)
    edges = [(rng.randrange(15), rng.randrange(15)) for _ in range(40)]
    edges = [(u, v) for u, v in edges if u != v]
    seeds = [0, 3, 7]
    got = _spark_ppr(spark, edges, seeds)
    want = _py_ppr(edges, seeds)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_mass_conserved(spark):
    rng = random.Random(5)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(30)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _spark_ppr(spark, edges, [1, 2], iters=4)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_unreachable_pages_score_zero(spark):
    # component {0->1} seeded; component {5->6} unreachable from the seed
    got = _spark_ppr(spark, [(0, 1), (5, 6)], [0])
    assert got[5] == 0.0 and got[6] == 0.0
    assert got[0] > 0 and got[1] > 0


def test_seed_outside_edges_keeps_restart_mass(spark):
    got = _spark_ppr(spark, [(0, 1)], [9])
    # 9 is dangling: every leak returns to it; it keeps all the mass
    assert got[9] == pytest.approx(1.0, abs=1e-12)
    assert got[0] == 0.0


def test_empty_seed_set_raises(spark):
    e = spark.createDataFrame([(0, 1)], "src: long, dst: long")
    s = spark.createDataFrame([], "node: long")
    with pytest.raises(ValueError):
        personalized_pagerank(e, s)


def test_all_nodes_seeded_matches_uniform_pagerank(spark):
    # seeding EVERY node differs from pagerank() only in where dangling
    # mass lands; on a dangling-free graph the two coincide exactly
    edges = [(0, 1), (1, 2), (2, 0), (0, 2), (2, 1)]
    nodes = [0, 1, 2]
    ppr = _spark_ppr(spark, edges, nodes)
    df = spark.createDataFrame(edges, "src: long, dst: long")
    plain = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    for v in nodes:
        assert ppr[v] == pytest.approx(plain[v], abs=1e-12), v
