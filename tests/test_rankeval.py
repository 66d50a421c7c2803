"""Gates for textops/rankeval.py: RBP against an exact integer
replay AND the float geometric series, the all-relevant conservation
rbp + residual == 1e6 (+1 trunc slack) EXACT lane, empty-relevance
zero, rank-1-vs-deep dominance (one hit at rank 1 beats hits at
ranks 10..18); tau_AP against an O(n^2) replay, identical == +1e6
and reversed == -1e6 EXACT lanes, and the top-weighting property
(an adjacent swap at the top costs more than the same swap at the
bottom — the property plain Kendall cannot see)."""

from __future__ import annotations

from spanluke_spark.textops.rankeval import rbp, tau_ap

# ---------------------------------------------------- python replays


def py_rbp(rels, depth=18):
    num = sum(
        r * 4 ** (d - 1) * 5 ** (depth - d)
        for d, r in enumerate(rels[:depth], start=1)
    )
    den = 5**depth
    return {
        "d_eval": depth,
        "n_rel": sum(rels[:depth]),
        "rbp_ppm": 10**6 * num // den,
        "residual_ppm": 10**6 * 4**depth // den,
    }


def py_tau_ap(pairs):
    n = len(pairs)
    if n < 2:
        return None
    csum = 0
    for si, ti in pairs:
        if si < 2:
            continue
        c = sum(1 for sj, tj in pairs if sj < si and tj < ti)
        csum += 10**6 * c // (si - 1)
    return 2 * csum // (n - 1) - 10**6


def _run_rbp(spark, rels, depth=18):
    df = spark.createDataFrame(
        [(0, d, r) for d, r in enumerate(rels, start=1)],
        "key long, rank long, rel long",
    )
    return rbp(df, depth=depth).collect()[0].asDict()


def _run_tau(spark, pairs):
    df = spark.createDataFrame(
        [(0, s, t) for s, t in pairs],
        "key long, sys_rank long, truth_rank long",
    )
    return tau_ap(df).collect()[0].asDict()


RELS = [1, 0, 1, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1, 0]


def test_rbp_matches_replay_and_float(spark):
    got = _run_rbp(spark, RELS)
    exp = py_rbp(RELS)
    assert {k: got[k] for k in exp} == exp
    f = 0.2 * sum(
        r * 0.8 ** (d - 1) for d, r in enumerate(RELS, start=1)
    )
    assert abs(got["rbp_ppm"] - f * 10**6) <= 2


def test_rbp_all_relevant_conservation(spark):
    got = _run_rbp(spark, [1] * 18)
    assert 10**6 - 1 <= got["rbp_ppm"] + got["residual_ppm"] <= 10**6


def test_rbp_none_relevant_zero(spark):
    got = _run_rbp(spark, [0] * 18)
    assert got["rbp_ppm"] == 0
    assert got["residual_ppm"] == py_rbp([0] * 18)["residual_ppm"]


def test_rbp_top_rank_dominates_deep_hits(spark):
    top = _run_rbp(spark, [1] + [0] * 17)
    deep = _run_rbp(spark, [0] * 9 + [1] * 9)
    assert top["rbp_ppm"] > deep["rbp_ppm"]


def test_tau_ap_matches_replay(spark):
    pairs = [(i + 1, t + 1) for i, t in enumerate([2, 0, 3, 1, 5, 4, 6])]
    got = _run_tau(spark, pairs)
    assert got["tau_ap_ppm"] == py_tau_ap(pairs)


def test_tau_ap_exact_endpoints(spark):
    ident = [(i, i) for i in range(1, 9)]
    rev = [(i, 9 - i) for i in range(1, 9)]
    assert _run_tau(spark, ident)["tau_ap_ppm"] == 10**6
    assert _run_tau(spark, rev)["tau_ap_ppm"] == -(10**6)


def test_tau_ap_top_weighted(spark):
    base = list(range(1, 11))
    # swap truth positions of the items at system ranks 1,2 vs 9,10
    top_swap = [(i, {1: 2, 2: 1}.get(i, i)) for i in base]
    bot_swap = [(i, {9: 10, 10: 9}.get(i, i)) for i in base]
    t_top = _run_tau(spark, top_swap)["tau_ap_ppm"]
    t_bot = _run_tau(spark, bot_swap)["tau_ap_ppm"]
    assert t_top == py_tau_ap(top_swap)
    assert t_bot == py_tau_ap(bot_swap)
    assert t_top < t_bot  # same single swap, pricier at the top
