"""SimRank — Python replay parity, symmetry, diagonal pinned to 1,
no-shared-ancestry-is-absent, the c-decay bound, and the textbook
two-papers-cite-both example."""

from __future__ import annotations

import random

import pytest

from spanluke_spark.graph.linkpred import simrank


def _py_simrank(edges, rounds=3, c=0.75):
    e = sorted({(u, v) for u, v in edges if u != v})
    nodes = sorted({x for p in e for x in p})
    inn = {v: sorted({u for u, w in e if w == v}) for v in nodes}
    s = {(a, a): 1.0 for a in nodes}
    for _ in range(rounds):
        nxt = {(a, a): 1.0 for a in nodes}
        for a in nodes:
            for b in nodes:
                if a == b or not inn[a] or not inn[b]:
                    continue
                tot = sum(s.get((i, j), 0.0) for i in inn[a] for j in inn[b])
                if tot:
                    nxt[(a, b)] = c * tot / (len(inn[a]) * len(inn[b]))
        s = nxt
    return s


def _spark_simrank(spark, edges, rounds=3, c=0.75):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        (r["a"], r["b"]): r["s"] for r in simrank(df, rounds=rounds, c=c).collect()
    }


def test_python_replay_parity(spark):
    rng = random.Random(13)
    edges = [(rng.randrange(12), rng.randrange(12)) for _ in range(28)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _spark_simrank(spark, edges)
    want = _py_simrank(edges)
    assert set(got) == set(want)  # same sparse support
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9), k


def test_symmetric_and_diagonal_one(spark):
    rng = random.Random(2)
    edges = [(rng.randrange(10), rng.randrange(10)) for _ in range(20)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _spark_simrank(spark, edges)
    for (a, b), v in got.items():
        if a == b:
            assert v == 1.0
        else:
            assert got[(b, a)] == pytest.approx(v, abs=1e-12)
            assert 0.0 < v <= 0.75 + 1e-12  # off-diagonal bounded by c


def test_cocited_pair_scores_c(spark):
    # 0 -> 2 and 0 -> 3: I(2) = I(3) = {0}; s(2,3) = c * s(0,0) = c
    got = _spark_simrank(spark, [(0, 2), (0, 3)], rounds=1)
    assert got[(2, 3)] == pytest.approx(0.75, abs=1e-12)
    # and it stays c at any later round (s(0,0) is pinned to 1)
    got3 = _spark_simrank(spark, [(0, 2), (0, 3)], rounds=3)
    assert got3[(2, 3)] == pytest.approx(0.75, abs=1e-12)


def test_disjoint_ancestries_absent(spark):
    # 0 -> 2, 1 -> 3: I(2) and I(3) never co-reach -> no (2, 3) row
    got = _spark_simrank(spark, [(0, 2), (1, 3)], rounds=3)
    assert (2, 3) not in got and (3, 2) not in got


def test_parallel_edges_collapse(spark):
    got_dup = _spark_simrank(spark, [(0, 2), (0, 2), (0, 3)], rounds=2)
    got = _spark_simrank(spark, [(0, 2), (0, 3)], rounds=2)
    assert got_dup == got
