"""Katz centrality — closed forms (star in-hub, path attenuation series),
Python matrix replay parity, the Katz-vs-PageRank distinction (no
out-degree dilution), and the dyadic exactness contract."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.graph.centrality import katz_centrality


def _py_katz(edges, n_ids, alpha=0.5, beta=1.0, rounds=6):
    nodes = sorted({x for e in edges for x in e})
    x = {v: beta for v in nodes}
    for _ in range(rounds):
        nxt = {}
        for v in nodes:
            s = sum(x[u] for u, w in set(edges) if w == v and u != w)
            nxt[v] = beta + alpha * s
        x = nxt
    return x


def _spark_katz(spark, edges, rounds=6, alpha=0.5):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    rows = katz_centrality(df, alpha=alpha, rounds=rounds).collect()
    return {r["node"]: r["katz"] for r in rows}


def test_star_in_hub_closed_form(spark):
    # k leaves -> hub: hub = 1 + alpha*k (stable after round 1), leaf = 1
    edges = [(i, 99) for i in range(1, 6)]
    got = _spark_katz(spark, edges)
    assert got[99] == pytest.approx(1 + 0.5 * 5)
    for i in range(1, 6):
        assert got[i] == 1.0


def test_path_attenuation_series(spark):
    # 0 -> 1 -> 2: after >= 2 rounds node 2 = 1 + a + a^2, node 1 = 1 + a
    edges = [(0, 1), (1, 2)]
    got = _spark_katz(spark, edges, rounds=4)
    assert got[2] == pytest.approx(1 + 0.5 + 0.25)
    assert got[1] == pytest.approx(1.5)
    assert got[0] == 1.0


def test_python_replay_parity_exact(spark):
    rng = random.Random(13)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(70)})
    edges = [(u, v) for u, v in edges if u != v]
    got = _spark_katz(spark, edges)
    want = _py_katz(edges, 25)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == want[v], v  # exact dyadic: == not approx


def test_no_out_degree_dilution(spark):
    # a 1000-out-link hub passes FULL credit to each target (unlike PR)
    edges = [(0, i) for i in range(1, 5)] + [(9, 0)]
    got = _spark_katz(spark, edges, rounds=3)
    # each target of 0 receives alpha * x(0); x(0) = 1 + alpha * x(9) = 1.5
    assert got[1] == pytest.approx(1 + 0.5 * 1.5)
    assert got[1] == got[2] == got[3] == got[4]


def test_cycle_accumulates_bounded(spark):
    edges = [(0, 1), (1, 2), (2, 0)]
    got = _spark_katz(spark, edges, rounds=6)
    # symmetric cycle: all equal, geometric series partial sum
    want = sum(0.5**k for k in range(7))
    assert got[0] == got[1] == got[2] == pytest.approx(want)
