"""Gates for evaluation/backtest_lr.py: Kupiec against a quantized
replay AND the float LR, the x/n == p EXACT-zero lane, too-many and
too-few exceptions both firing (two-sided through the LR), x == 0
boundary; Christoffersen against replay + float, the clustered-
bursts-fire vs spread-out-quiet pair, the p01 == p11 exact-zero
lane, and degenerate NULLs (no exceptions / all exceptions)."""

from __future__ import annotations

import math

from spanluke_spark.evaluation.backtest_lr import christoffersen, kupiec_pof

# ---------------------------------------------------- python replays


def q6(v):
    return round(math.log(v) * 10**6)


def py_kupiec(seq, num, den):
    n, x = len(seq), sum(seq)
    half = 0
    if x > 0:
        half += x * q6(x * den / (n * num))
    if n - x > 0:
        half += (n - x) * q6((n - x) * den / (n * (den - num)))
    lr = 2 * half // 1000
    return {"n": n, "x": x, "lr_milli": lr, "sig05": lr > 3841}


def py_christoffersen(seq):
    trans = list(zip(seq, seq[1:]))
    n00 = sum(1 for a, b in trans if a == 0 and b == 0)
    n01 = sum(1 for a, b in trans if a == 0 and b == 1)
    n10 = sum(1 for a, b in trans if a == 1 and b == 0)
    n11 = sum(1 for a, b in trans if a == 1 and b == 1)
    m = len(trans)
    ones = n01 + n11
    out = {"m": m, "n00": n00, "n01": n01, "n10": n10, "n11": n11}
    if n00 + n01 == 0 or n10 + n11 == 0 or ones in (0, m):
        return {**out, "lr_milli": None, "sig05": None}
    half = 0
    if n00:
        half += n00 * q6(n00 * m / ((n00 + n01) * (m - ones)))
    if n01:
        half += n01 * q6(n01 * m / ((n00 + n01) * ones))
    if n10:
        half += n10 * q6(n10 * m / ((n10 + n11) * (m - ones)))
    if n11:
        half += n11 * q6(n11 * m / ((n10 + n11) * ones))
    lr = 2 * half // 1000
    return {**out, "lr_milli": lr, "sig05": lr > 3841}


def _run_kupiec(spark, seq, num, den):
    df = spark.createDataFrame([(int(v),) for v in seq], "exceed long")
    return kupiec_pof(df, num, den).collect()[0].asDict()


def _run_chris(spark, seq):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(seq)], "t long, exceed long"
    )
    return christoffersen(df).collect()[0].asDict()


# -------------------------------------------------------------- kupiec


def test_kupiec_matches_replay_and_float(spark):
    seq = [1 if i % 9 == 0 else 0 for i in range(90)]  # 10% vs 5%
    got = _run_kupiec(spark, seq, 1, 20)
    assert got == py_kupiec(seq, 1, 20)
    n, x, p = 90, 10, 0.05
    lr = 2 * (
        x * math.log((x / n) / p)
        + (n - x) * math.log(((n - x) / n) / (1 - p))
    )
    assert abs(got["lr_milli"] - lr * 1000) <= 2


def test_kupiec_exact_rate_zero(spark):
    seq = [1] * 5 + [0] * 95  # x/n = 1/20 == p exactly
    got = _run_kupiec(spark, seq, 1, 20)
    assert got["lr_milli"] == 0 and got["sig05"] is False


def test_kupiec_two_sided(spark):
    over = [1 if i % 5 == 0 else 0 for i in range(100)]  # 20% vs 5%
    under = [0] * 200  # 0% vs 5%
    assert _run_kupiec(spark, over, 1, 20)["sig05"] is True
    got_u = _run_kupiec(spark, under, 1, 20)
    assert got_u == py_kupiec(under, 1, 20)
    assert got_u["sig05"] is True  # 0 exceptions in 200 is too clean


def test_kupiec_small_sample_quiet(spark):
    seq = [1] + [0] * 18  # 1/19 vs 1/20: nothing to see
    got = _run_kupiec(spark, seq, 1, 20)
    assert got == py_kupiec(seq, 1, 20)
    assert got["sig05"] is False


# ------------------------------------------------------- christoffersen


def test_chris_matches_replay_and_float(spark):
    seq = [1 if i % 7 in (0, 1) else 0 for i in range(70)]
    got = _run_chris(spark, seq)
    assert got == py_christoffersen(seq)
    m, ones = got["m"], got["n01"] + got["n11"]
    p01 = got["n01"] / (got["n00"] + got["n01"])
    p11 = got["n11"] / (got["n10"] + got["n11"])
    pp = ones / m

    def term(c, p):
        return c * math.log(p) if c else 0.0

    lr = 2 * (
        term(got["n00"], (1 - p01) / (1 - pp))
        + term(got["n01"], p01 / pp)
        + term(got["n10"], (1 - p11) / (1 - pp))
        + term(got["n11"], p11 / pp)
    )
    assert abs(got["lr_milli"] - lr * 1000) <= 2


def test_chris_bursts_fire_spread_quiet(spark):
    bursts = ([1] * 6 + [0] * 24) * 4  # clustered exceptions
    spread = [1 if i % 5 == 0 else 0 for i in range(120)]  # isolated
    got_b = _run_chris(spark, bursts)
    got_s = _run_chris(spark, spread)
    assert got_b == py_christoffersen(bursts)
    assert got_s == py_christoffersen(spread)
    assert got_b["sig05"] is True
    assert got_b["lr_milli"] > got_s["lr_milli"]


def test_chris_equal_rates_exact_zero(spark):
    # after 0 and after 1 the exceedance rate is identically 1/2
    seq = [0, 1] * 20  # p01 = 1, p11 = 0 -> NOT zero; build iid-like
    seq = [0, 0, 1, 1] * 10  # p01 = n01/(n00+n01), p11 = ...
    # craft exact equality: transitions 00,01,11,10 repeating ->
    # n00 == n01 and n11 == n10 -> p01 == p11 == 1/2 == pp exactly
    got = _run_chris(spark, seq)
    assert got == py_christoffersen(seq)
    if got["n00"] == got["n01"] and got["n10"] == got["n11"]:
        assert got["lr_milli"] == 0


def test_chris_degenerate_nulls(spark):
    assert _run_chris(spark, [0] * 30)["lr_milli"] is None
    assert _run_chris(spark, [1] * 30)["lr_milli"] is None
