"""Gale-Shapley stable matching — parallel deferred-acceptance rounds
vs a sequential 1962-algorithm python replay (the deferred-acceptance
outcome is proposal-order independent, so they must agree exactly),
no-blocking-pair stability audit, incomplete-list semantics
(unacceptable proposals drop; unmatchable proposers are omitted), and
the q279 fixture's 8-round convergence pin."""

from __future__ import annotations

import random

from spanluke_spark.graph.stable_matching import gale_shapley


def py_gale_shapley(pref_p: dict, rank_a: dict) -> dict:
    """Sequential textbook GS. pref_p: p -> list of a in preference
    order; rank_a: a -> {p: rank}. Returns {p: a} for matched p."""
    ptr = {p: 0 for p in pref_p}
    engaged_a: dict = {}
    free = list(pref_p)
    while free:
        p = free.pop()
        while ptr[p] < len(pref_p[p]):
            a = pref_p[p][ptr[p]]
            ptr[p] += 1
            if p not in rank_a.get(a, {}):
                continue  # unacceptable: rejected outright
            cur = engaged_a.get(a)
            if cur is None:
                engaged_a[a] = p
                break
            if rank_a[a][p] < rank_a[a][cur]:
                engaged_a[a] = p
                free.append(cur)
                break
        # exhausted list -> stays unmatched
    return {p: a for a, p in engaged_a.items()}


def _to_dfs(spark, pref_p, pref_a):
    rows_p = [
        (p, r + 1, a) for p, lst in pref_p.items() for r, a in enumerate(lst)
    ]
    rows_a = [
        (a, r + 1, p) for a, lst in pref_a.items() for r, p in enumerate(lst)
    ]
    return (
        spark.createDataFrame(rows_p, "p: long, rank: int, a: long"),
        spark.createDataFrame(rows_a, "a: long, rank: int, p: long"),
    )


def _run(spark, pref_p, pref_a):
    pp, pa = _to_dfs(spark, pref_p, pref_a)
    out = gale_shapley(pp, pa).collect()
    got = {r["p"]: r["a"] for r in out}
    assert len(out) == len(got), "duplicate proposer rows"
    assert len(set(got.values())) == len(got), "acceptor matched twice"
    rank_a = {a: {p: r + 1 for r, p in enumerate(l)} for a, l in pref_a.items()}
    assert got == py_gale_shapley(pref_p, rank_a)
    # stability audit: no (p, a) both preferring each other to partners
    rank_p = {p: {a: r + 1 for r, a in enumerate(l)} for p, l in pref_p.items()}
    inv = {a: p for p, a in got.items()}
    for p, lst in pref_p.items():
        for a in lst:
            if p not in rank_a.get(a, {}):
                continue
            p_better = got.get(p) is None or rank_p[p][a] < rank_p[p][got[p]]
            a_better = inv.get(a) is None or rank_a[a][p] < rank_a[a][inv[a]]
            assert not (p_better and a_better), f"blocking pair ({p},{a})"
    # reported ranks match the input lists
    for r in out:
        assert r["p_rank"] == rank_p[r["p"]][r["a"]]
        assert r["a_rank"] == rank_a[r["a"]][r["p"]]
    return got


def test_random_complete_lists_match_sequential(spark):
    rng = random.Random(7)
    for n in (3, 6, 9):
        ps, as_ = list(range(n)), list(range(100, 100 + n))
        pref_p = {p: rng.sample(as_, n) for p in ps}
        pref_a = {a: rng.sample(ps, n) for a in as_}
        got = _run(spark, pref_p, pref_a)
        assert len(got) == n  # complete lists -> perfect matching


def test_incomplete_lists_and_unmatched_proposer(spark):
    # p=2 lists only a=10, who finds p=2 unacceptable -> p=2 unmatched.
    pref_p = {0: [10, 11], 1: [10, 11], 2: [10]}
    pref_a = {10: [0, 1], 11: [1, 0]}
    got = _run(spark, pref_p, pref_a)
    assert 2 not in got
    assert got == {0: 10, 1: 11}


def test_proposer_optimal_vs_acceptor_optimal_classic(spark):
    # Classic 3x3 instance where proposer- and acceptor-optimal differ:
    # everyone gets their FIRST choice under proposer-proposing.
    pref_p = {0: [10, 11, 12], 1: [11, 12, 10], 2: [12, 10, 11]}
    pref_a = {10: [1, 2, 0], 11: [2, 0, 1], 12: [0, 1, 2]}
    got = _run(spark, pref_p, pref_a)
    assert got == {0: 10, 1: 11, 2: 12}


def test_q279_fixture_converges_in_8_rounds(spark, sf_dir):
    """Round pin behind _gs_oracle_sql(9): round 9 must be idempotent —
    running the parallel loop capped at 8 rounds already yields the
    full matching (all 14 proposers engaged)."""
    import __spark_entry__ as entry

    pp, pa = entry._gs_prefs(spark, sf_dir)
    out = gale_shapley(pp, pa, max_rounds=8).collect()
    assert len(out) == entry._GS_N
    full = {(r["p"], r["a"]) for r in gale_shapley(pp, pa).collect()}
    assert {(r["p"], r["a"]) for r in out} == full
