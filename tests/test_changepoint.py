"""Gates for evaluation/changepoint.py: Pettitt against the O(n^2)
DEFINITIONAL sgn replay (ties included) — proving the double-rank
identity U_t = t(n+1) - cum(DR) — plus the clean-step closed form
(break located exactly, K = t*(n-t)), constant-series zero, shuffle
invariance of the rank lane; Cox-Stuart against math.comb exact
binomial tails, monotone/flat closed forms, tie dropping, the
balanced p == 1 cap, and the m > 40 out-of-regime NULL."""

from __future__ import annotations

from math import comb

from spanluke_spark.evaluation.changepoint import cox_stuart, pettitt

# ---------------------------------------------------- python replays


def py_pettitt(xs):
    n = len(xs)
    best_k, best_t, best_u = -1, None, None
    for t in range(1, n):
        u = sum(
            (xs[j] > xs[i]) - (xs[j] < xs[i])
            for i in range(t)
            for j in range(t, n)
        )
        if abs(u) > best_k:
            best_k, best_t, best_u = abs(u), t, u
    exp_milli = 6000 * best_k * best_k // (n**3 + n**2)
    sig = 6_000_000 * best_k * best_k > 3_688_879 * (n**3 + n**2)
    return {
        "n": n,
        "k_stat": best_k,
        "t_star": best_t,
        "u_at_break": best_u,
        "exp_milli": exp_milli,
        "sig05": sig,
    }


def py_cox_stuart(xs):
    n = len(xs)
    c = (n + 1) // 2
    pairs = [(xs[i], xs[i + c]) for i in range(n // 2)]
    sp = sum(1 for a, b in pairs if b > a)
    sm = sum(1 for a, b in pairs if b < a)
    m = sp + sm
    out = {
        "n": n, "n_pairs": len(pairs), "s_plus": sp, "s_minus": sm,
        "m": m, "p_num": None, "p_den": None, "p_ppm": None,
        "direction": (
            "rising" if sp > sm else "falling" if sp < sm else "balanced"
        ),
        "sig05": None,
    }
    if 1 <= m <= 40:
        tail = sum(comb(m, k) for k in range(min(sp, sm) + 1))
        den = 2**m
        num = min(2 * tail, den)
        out.update(
            p_num=num,
            p_den=den,
            p_ppm=num * 10**6 // den,
            sig05=20 * num <= den,
        )
    return out


def _run_pt(spark, xs):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    return pettitt(df).collect()[0].asDict()


def _run_cs(spark, xs):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    return cox_stuart(df).collect()[0].asDict()


# ------------------------------------------------------------ pettitt


def test_pettitt_matches_definitional_replay_with_ties(spark):
    xs = [5, 7, 5, 6, 9, 9, 12, 11, 12, 14, 9, 13, 12, 12, 15, 11]
    assert _run_pt(spark, xs) == py_pettitt(xs)


def test_pettitt_clean_step(spark):
    xs = [0] * 12 + [10] * 12
    got = _run_pt(spark, xs)
    assert got["t_star"] == 12
    # every (early, late) pair rises: K = 12 * 12, U negative under
    # the sgn(x_j - x_i) convention folded as t(n+1) - cumDR
    assert got["k_stat"] == 144
    assert got == py_pettitt(xs)
    assert got["sig05"] is True


def test_pettitt_constant_series(spark):
    got = _run_pt(spark, [3] * 10)
    assert got["k_stat"] == 0 and got["sig05"] is False
    assert got["exp_milli"] == 0


def test_pettitt_no_break_noise_not_significant(spark):
    xs = [(i * 7) % 5 for i in range(30)]
    got = _run_pt(spark, xs)
    assert got == py_pettitt(xs)
    assert got["sig05"] is False


# --------------------------------------------------------- cox-stuart


def test_cox_stuart_matches_comb_replay(spark):
    xs = [(i * 3) % 11 + i // 3 for i in range(25)]
    assert _run_cs(spark, xs) == py_cox_stuart(xs)


def test_cox_stuart_monotone_rising(spark):
    xs = list(range(30))
    got = _run_cs(spark, xs)
    assert got["s_plus"] == 15 and got["s_minus"] == 0
    assert got["direction"] == "rising"
    assert got["p_num"] == 2 and got["p_den"] == 2**15
    assert got["sig05"] is True


def test_cox_stuart_all_ties_null(spark):
    got = _run_cs(spark, [4] * 20)
    assert got["m"] == 0
    assert got["p_ppm"] is None and got["sig05"] is None
    assert got["direction"] == "balanced"


def test_cox_stuart_balanced_p_capped_at_one(spark):
    # alternating rise/fall in pairs: S+ == S-, two-sided p caps at 1
    xs = [0, 10, 0, 10, 0, 10, 0, 10] + [5, 5, 15, 5, 15, 5, 15, 5]
    got = _run_cs(spark, xs)
    assert got == py_cox_stuart(xs)
    if got["p_num"] is not None and got["s_plus"] == got["s_minus"]:
        assert got["p_num"] == got["p_den"]


def test_cox_stuart_out_of_regime_null(spark):
    xs = list(range(100))  # m = 50 > 40
    got = _run_cs(spark, xs)
    assert got["m"] == 50
    assert got["p_num"] is None and got["sig05"] is None


def test_cox_stuart_odd_n_drops_middle(spark):
    xs = [1, 2, 3, 100, 4, 5, 6]  # n = 7, middle (100) never paired
    got = _run_cs(spark, xs)
    assert got == py_cox_stuart(xs)
    assert got["n_pairs"] == 3
