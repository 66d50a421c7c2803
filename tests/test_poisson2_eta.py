"""Gates for the exact two-rate Poisson C-test (evaluation/
poisson2.py) and eta-squared (evaluation/eta.py): the C-test against
an exact python replay, the binomial-theorem invariant
sum T_x == (m1+m2)^k, the exact-expectation p == 1 lane, planted
rate excess significant, one-sided direction, k > 14 NULL, bad
exposure ValueError; eta^2 against a replay AND a float SSB/SST
cross-check, group-determined ~1e6, single-group exact 0, zero-
variance NULL, and global-shift exactness."""

from __future__ import annotations

from math import comb

import pytest

from spanluke_spark.evaluation.eta import correlation_ratio
from spanluke_spark.evaluation.poisson2 import two_rate_poisson

# ---------------------------------------------------- python replays


def py_c_test(a, b, m1=3, m2=5):
    k = a + b
    if k < 1 or k > 14:
        return {"a": a, "b": b, "k": k, "t_obs": None, "p_num": None,
                "p_den": None, "p_ppm": None, "direction": None,
                "sig05": None}
    t = [comb(k, x) * m1**x * m2 ** (k - x) for x in range(k + 1)]
    tobs = t[a]
    p_num = sum(w for w in t if w <= tobs)
    p_den = (m1 + m2) ** k
    dev = a * m2 - b * m1
    return {
        "a": a, "b": b, "k": k, "t_obs": tobs,
        "p_num": p_num, "p_den": p_den,
        "p_ppm": p_num * 10**6 // p_den,
        "direction": (
            "a_rate_higher" if dev > 0
            else "b_rate_higher" if dev < 0 else "exact_expectation"
        ),
        "sig05": 20 * p_num <= p_den,
    }


def py_eta(rows):
    per = {}
    for g, x in rows:
        nj, tj = per.get(g, (0, 0))
        per[g] = (nj + 1, tj + x)
    n = len(rows)
    t = sum(x for _, x in rows)
    sxx = sum(x * x for _, x in rows)
    d = n * sxx - t * t
    cells = (
        None if d <= 0
        else sum(
            10**6 * (n * tj - nj * t) ** 2 // (nj * n * d)
            for nj, tj in per.values()
        )
    )
    return {"n": n, "k": len(per), "eta2_ppm": cells}


def _run_c(spark, a, b, m1=3, m2=5):
    rows = [(0,)] * a + [(1,)] * b
    df = spark.createDataFrame(rows, "grp long")
    return two_rate_poisson(df, m1=m1, m2=m2).collect()[0].asDict()


def _run_eta(spark, rows):
    df = spark.createDataFrame(rows, "grp long, value long")
    return correlation_ratio(df).collect()[0].asDict()


# -------------------------------------------------------------- c-test


def test_c_matches_replay_and_theorem(spark):
    for a, b in ((10, 4), (6, 8), (2, 9), (1, 1)):
        got = _run_c(spark, a, b)
        exp = py_c_test(a, b)
        assert got == exp
        assert got["p_den"] == 8 ** (a + b)  # binomial theorem


def test_c_planted_excess_significant(spark):
    got = _run_c(spark, 10, 4)
    assert got["sig05"] is True
    assert got["direction"] == "a_rate_higher"


def test_c_exact_expectation_p_one(spark):
    """a:b == m1:m2 — the observed count is the modal weight, every
    weight is <= it, p == 1 exactly."""
    got = _run_c(spark, 3, 5)
    assert got["p_num"] == got["p_den"]
    assert got["p_ppm"] == 10**6 and got["sig05"] is False
    assert got["direction"] == "exact_expectation"


def test_c_balanced_not_significant(spark):
    got = _run_c(spark, 6, 8)
    assert got["sig05"] is False


def test_c_out_of_regime_null(spark):
    got = _run_c(spark, 10, 10)  # k = 20 > 14
    assert got["p_ppm"] is None and got["sig05"] is None
    assert got["direction"] is None


def test_c_bad_exposure_raises(spark):
    df = spark.createDataFrame([(0,)], "grp long")
    with pytest.raises(ValueError):
        two_rate_poisson(df, m1=4, m2=5)


# ----------------------------------------------------------------- eta

ROWS = [(e % 4, (e * 13) % 30 + 5 * (e % 4)) for e in range(200)]


def test_eta_matches_replay_and_float(spark):
    got = _run_eta(spark, ROWS)
    assert got == py_eta(ROWS)
    per = {}
    for g, x in ROWS:
        per.setdefault(g, []).append(x)
    n = len(ROWS)
    xbar = sum(x for _, x in ROWS) / n
    ssb = sum(
        len(v) * (sum(v) / len(v) - xbar) ** 2 for v in per.values()
    )
    sst = sum(x * x for _, x in ROWS) - n * xbar * xbar
    assert abs(got["eta2_ppm"] - ssb / sst * 10**6) <= 4


def test_eta_group_determined(spark):
    rows = [(e % 4, 10 * (e % 4)) for e in range(160)]
    got = _run_eta(spark, rows)
    assert got["eta2_ppm"] >= 10**6 - 4  # within-group variance 0


def test_eta_single_group_zero(spark):
    rows = [(0, (e * 13) % 30) for e in range(80)]
    assert _run_eta(spark, rows)["eta2_ppm"] == 0


def test_eta_zero_variance_null(spark):
    rows = [(e % 4, 7) for e in range(40)]
    assert _run_eta(spark, rows)["eta2_ppm"] is None


def test_eta_global_shift_exact(spark):
    shifted = [(g, x + 1000) for g, x in ROWS]
    assert (
        _run_eta(spark, ROWS)["eta2_ppm"]
        == _run_eta(spark, shifted)["eta2_ppm"]
    )
