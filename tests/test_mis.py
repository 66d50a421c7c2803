"""Maximal independent set — independence + maximality on random graphs,
Python round-replay parity, isolated/self-loop semantics, fixed-priority
determinism."""

from __future__ import annotations

import random

from spanluke_spark.graph.mis import _P31, _PRIO_ADD, _PRIO_MULT, maximal_independent_set


def _pk(v: int) -> int:
    return ((v * _PRIO_MULT + _PRIO_ADD) % _P31) * 2147483648 + v


def _py_mis(edges, rounds=12):
    """Sequential replay of the synchronous Luby rounds."""
    adj = {}
    for u, v in edges:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    live = {x for e in edges for x in e}
    for n in live:
        adj.setdefault(n, set())
    out = {}
    for r in range(1, rounds + 1):
        if not live:
            break
        winners = {
            n
            for n in live
            if all(_pk(n) < _pk(m) for m in adj[n] if m in live)
        }
        for n in winners:
            out[n] = r
        removed = set(winners)
        for n in winners:
            removed |= adj[n] & live
        live -= removed
    return out, live


def _spark_mis(spark, edges, rounds=12):
    df = spark.createDataFrame(edges, "src: long, dst: long")
    return {
        r["node"]: r["mis_round"]
        for r in maximal_independent_set(df, rounds=rounds).collect()
    }


def test_python_replay_parity(spark):
    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(90)]
    got = _spark_mis(spark, edges)
    want, live = _py_mis(edges)
    assert not live  # replay converged within the budget
    assert got == want


def test_independence_and_maximality(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    mis = set(_spark_mis(spark, edges))
    adj = {}
    nodes = set()
    for u, v in edges:
        nodes.update((u, v))
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    # independence: no edge inside the set
    for n in mis:
        assert not (adj.get(n, set()) & mis), n
    # maximality: every non-member has a member neighbor
    for n in nodes - mis:
        assert adj.get(n, set()) & mis, n


def test_isolated_nodes_win_round_one(spark):
    # 5—6 is the only conflict; 0 appears only in a self-loop edge list
    got = _spark_mis(spark, [(5, 6), (7, 7)])
    assert got[7] == 1  # self-loop dropped -> isolated -> vacuous winner
    assert (5 in got) != (6 in got)
    assert got[min(got)] == 1


def test_priority_decides_the_winner(spark):
    # a path 0-1-2: either the middle is the local minimum (MIS {1}) or
    # both ends end up selected (possibly across two rounds)
    got = _spark_mis(spark, [(0, 1), (1, 2)])
    want, live = _py_mis([(0, 1), (1, 2)])
    assert not live
    assert got == want
    assert set(got) in ({1}, {0, 2})


def test_deterministic_across_runs(spark):
    rng = random.Random(3)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(70)]
    assert _spark_mis(spark, edges) == _spark_mis(spark, edges)
