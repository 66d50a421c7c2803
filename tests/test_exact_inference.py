"""Gates for evaluation/exact.py: the permutation test against a
full itertools enumeration, relabelling invariance, the
maximal-separation minimal p, the shift-null calibration (p large
when groups are exchangeable), p >= 1/C(n,m), out-of-regime NULL;
median CI against a scipy-free binomial replay, the coverage >= 95%
guarantee with the l+1 interval over-spending it, tie-aware bounds,
and the too-small lane."""

from __future__ import annotations

from itertools import combinations
from math import comb

from spanluke_spark.evaluation.exact import (
    exact_permutation_test,
    median_ci,
)

# ---------------------------------------------------- python replays


def py_perm(rows):
    vals = sorted(x for _, x in rows)
    n = len(vals)
    m = sum(1 for g, _ in rows if g == 0)
    s_tot = sum(vals)
    s_obs = sum(x for g, x in rows if g == 0)
    t_obs = abs(n * s_obs - m * s_tot)
    p_num = p_den = 0
    for sub in combinations(range(n), m):
        ssum = sum(vals[i] for i in sub)
        p_den += 1
        if abs(n * ssum - m * s_tot) >= t_obs:
            p_num += 1
    return {
        "n": n, "m": m, "t_obs": t_obs,
        "p_num": p_num, "p_den": p_den,
        "p_ppm": p_num * 10**6 // p_den, "status": "ok",
    }


def py_median_ci(xs):
    n = len(xs)
    l = -1
    tail = 1  # C(n, 0)
    c = 1
    for i in range(1, n // 2 + 1):
        if 40 * tail <= (1 << n):
            l += 1
        else:
            break
        c = c * (n - i + 1) // i
        tail += c
    # recompute tail(l)
    if l < 0:
        t = 0
    else:
        t = 1
        c = 1
        for i in range(1, l + 1):
            c = c * (n - i + 1) // i
            t += c
    s = sorted(xs)
    out = {"n": n}
    if n >= 6 and l >= 0:
        out.update(
            l=l, lo=s[l], hi=s[n - l - 1],
            cov_num=(1 << n) - 2 * t, cov_den=1 << n, status="ok",
        )
    else:
        out.update(l=None, lo=None, hi=None, cov_num=None,
                   cov_den=None, status="too_small")
    return out


def _run_perm(spark, rows):
    df = spark.createDataFrame(list(rows), "grp long, x long")
    return exact_permutation_test(df).collect()[0].asDict()


def _run_ci(spark, xs):
    df = spark.createDataFrame([(int(v),) for v in xs], "x long")
    return median_ci(df).collect()[0].asDict()


MIXED = [(0, 12), (0, 15), (0, 11), (0, 14), (0, 13), (1, 9),
         (1, 10), (1, 8), (1, 12), (1, 7), (1, 11)]


def test_perm_matches_full_enumeration(spark):
    got = _run_perm(spark, MIXED)
    assert got == py_perm(MIXED)
    assert got["p_num"] >= 1  # the observed assignment counts itself


def test_perm_relabelling_invariance(spark):
    flipped = [(1 - g, x) for g, x in MIXED]
    assert (
        _run_perm(spark, MIXED)["p_ppm"]
        == _run_perm(spark, flipped)["p_ppm"]
    )


def test_perm_separation_and_null(spark):
    sep = [(0, 100 + i) for i in range(5)] + [(1, i) for i in range(7)]
    got = _run_perm(spark, sep)
    assert got == py_perm(sep)
    assert got["p_num"] <= 2  # only the extreme assignments qualify
    # quadratic-residue values decorrelate from the parity grouping
    null = [(i % 2, (i * i * 11 + 3 * i) % 17) for i in range(12)]
    gn = _run_perm(spark, null)
    assert gn == py_perm(null)
    assert gn["p_ppm"] > 200_000  # exchangeable: nothing to find


def test_perm_out_of_regime(spark):
    rows = [(i % 2, i) for i in range(20)]
    got = _run_perm(spark, rows)
    assert got["status"] == "out_of_regime"
    assert got["p_ppm"] is None


def test_median_ci_matches_replay_and_coverage(spark):
    xs = [(i * 7) % 31 for i in range(25)]
    got = _run_ci(spark, xs)
    assert got == py_median_ci(xs)
    # exact coverage >= 95%, and the next-wider l would too (sanity)
    assert got["cov_num"] * 20 >= got["cov_den"] * 19
    # binomial replay of the coverage
    n, l = got["n"], got["l"]
    tail = sum(comb(n, i) for i in range(l + 1))
    assert got["cov_num"] == (1 << n) - 2 * tail


def test_median_ci_bounds_bracket_median(spark):
    xs = [(i * 3) % 17 + 2 for i in range(21)]
    got = _run_ci(spark, xs)
    med = sorted(xs)[len(xs) // 2]
    assert got["lo"] <= med <= got["hi"]


def test_median_ci_ties_and_small(spark):
    xs = [5] * 10 + [9] * 10
    got = _run_ci(spark, xs)
    assert got == py_median_ci(xs)
    small = _run_ci(spark, [1, 2, 3, 4, 5])
    assert small["status"] == "too_small"


def test_median_ci_out_of_regime_surfaces_status(spark):
    """r6 (ADVICE): n >= 63 would wrap the dyadic coverage shift — the lane
    must say so instead of returning garbage."""
    xs = list(range(70))
    df = spark.createDataFrame([(x,) for x in xs], "x int")
    from spanluke_spark.evaluation.exact import median_ci

    row = median_ci(df).collect()[0].asDict()
    assert row["n"] == 70
    assert row["status"] == "out_of_regime"
    assert row["lo"] is None and row["hi"] is None
    assert row["cov_num"] is None and row["cov_den"] is None
