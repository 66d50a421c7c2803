"""Weighted PageRank — Python replay parity, reduction to unweighted on
equal weights, weight-proportional vote split, positive-weight contract,
and probability-mass conservation."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.graph.pagerank import pagerank, weighted_pagerank


def _py_wpr(edges, iters=3, d=0.85):
    agg = {}
    for u, v, w in edges:
        agg[(u, v)] = agg.get((u, v), 0.0) + w
    nodes = sorted({x for u, v in agg for x in (u, v)})
    n = len(nodes)
    outw = {}
    for (u, _v), w in agg.items():
        outw[u] = outw.get(u, 0.0) + w
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dang = sum(r for v, r in rank.items() if v not in outw)
        inflow = {v: 0.0 for v in nodes}
        for (u, v), w in agg.items():
            inflow[v] += rank[u] / outw[u] * w
        rank = {
            v: (1 - d) / n + d * dang / n + d * inflow[v] for v in nodes
        }
    return rank


def _spark_wpr(spark, edges, iters=3):
    df = spark.createDataFrame(edges, "src: long, dst: long, weight: double")
    return {
        r["node"]: r["rank"] for r in weighted_pagerank(df, iters=iters).collect()
    }


def test_python_replay_parity(spark):
    rng = random.Random(23)
    edges = [
        (rng.randrange(12), rng.randrange(12), float(rng.randint(1, 9)))
        for _ in range(35)
    ]
    edges = [(u, v, w) for u, v, w in edges if u != v]
    got = _spark_wpr(spark, edges)
    want = _py_wpr(edges)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_equal_weights_reduce_to_unweighted(spark):
    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (3, 0)]
    weighted = _spark_wpr(spark, [(u, v, 7.0) for u, v in edges])
    df = spark.createDataFrame(edges, "src: long, dst: long")
    plain = {r["node"]: r["rank"] for r in pagerank(df, iters=3).collect()}
    for v in plain:
        assert weighted[v] == pytest.approx(plain[v], abs=1e-12), v


def test_heavier_edge_gets_more_rank(spark):
    # 0 votes for 1 (weight 9) and 2 (weight 1)
    got = _spark_wpr(spark, [(0, 1, 9.0), (0, 2, 1.0)], iters=1)
    assert got[1] > got[2]
    share = (got[1] - got[2]) / 0.85  # d * rank(0) * (0.9 - 0.1)
    assert share == pytest.approx((1 / 3) * 0.8, abs=1e-12)


def test_mass_conserved(spark):
    rng = random.Random(4)
    edges = [
        (rng.randrange(10), rng.randrange(10), float(rng.randint(1, 5)))
        for _ in range(25)
    ]
    edges = [(u, v, w) for u, v, w in edges if u != v]
    got = _spark_wpr(spark, edges, iters=4)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_nonpositive_weight_raises(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 0.0)], "src: long, dst: long, weight: double"
    )
    with pytest.raises(ValueError):
        weighted_pagerank(df)
