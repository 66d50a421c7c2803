"""Gates for evaluation/outliers.py: Grubbs against an exact integer
replay AND the float definition, the algebraic bound
G^2 <= (n-1)^2/n, planted-spike detection with the right suspect on
both sides, upper-wins tie rule, constant NULL; Dixon against an
order-statistic replay, the tied-extreme zero lane, the lonely-point
near-1e6 lane, symmetric-reflection swap of q_min/q_max, zero-range
and tiny-n NULLs."""

from __future__ import annotations

from spanluke_spark.evaluation.outliers import dixon_q, grubbs

# ---------------------------------------------------- python replays


def py_grubbs(xs):
    n = len(xs)
    sx = sum(xs)
    szz = n * sum(v * v for v in xs) - sx * sx
    dev_hi = n * max(xs) - sx
    dev_lo = sx - n * min(xs)
    maxdev = max(dev_hi, dev_lo)
    return {
        "n": n,
        "suspect": max(xs) if dev_hi >= dev_lo else min(xs),
        "maxdev": maxdev,
        "szz": szz,
        "g2_milli": (
            1000 * maxdev * maxdev * (n - 1) // (n * szz)
            if szz > 0 and n > 1
            else None
        ),
    }


def py_dixon(xs):
    n = len(xs)
    s = sorted(xs)
    x1, x2, xn1, xn = s[0], s[1], s[-2], s[-1]
    ok = n >= 3 and xn > x1
    return {
        "n": n, "x1": x1, "x2": x2, "xn1": xn1, "xn": xn,
        "q_min_ppm": (x2 - x1) * 10**6 // (xn - x1) if ok else None,
        "q_max_ppm": (xn - xn1) * 10**6 // (xn - x1) if ok else None,
    }


def _run(spark, xs, fn):
    df = spark.createDataFrame([(int(v),) for v in xs], "x long")
    return fn(df).collect()[0].asDict()


MIXED = [14, 9, 11, 12, 10, 13, 9, 42, 11, 10, 12, 13]


def test_grubbs_matches_replay_and_float(spark):
    got = _run(spark, MIXED, grubbs)
    exp = py_grubbs(MIXED)
    assert got == exp
    n = len(MIXED)
    mean = sum(MIXED) / n
    s2 = sum((v - mean) ** 2 for v in MIXED) / (n - 1)
    g2 = max((max(MIXED) - mean) ** 2, (min(MIXED) - mean) ** 2) / s2
    assert abs(got["g2_milli"] - g2 * 1000) <= 1


def test_grubbs_bound_and_suspects(spark):
    got = _run(spark, MIXED, grubbs)
    n = got["n"]
    assert got["g2_milli"] <= 1000 * (n - 1) ** 2 // n
    assert got["suspect"] == 42
    low = [-40 if v == 42 else v for v in MIXED]
    assert _run(spark, low, grubbs)["suspect"] == -40


def test_grubbs_upper_wins_tie(spark):
    xs = [-5, 0, 0, 0, 0, 5]
    got = _run(spark, xs, grubbs)
    assert got == py_grubbs(xs)
    assert got["suspect"] == 5


def test_grubbs_constant_null(spark):
    got = _run(spark, [7] * 8, grubbs)
    assert got["g2_milli"] is None


def test_dixon_matches_replay(spark):
    got = _run(spark, MIXED, dixon_q)
    assert got == py_dixon(MIXED)
    # the lonely 42: huge top gap, tiny bottom gap
    assert got["q_max_ppm"] > 800_000
    assert got["q_min_ppm"] < 100_000


def test_dixon_tied_extreme_zero(spark):
    xs = [1, 1, 5, 9, 20, 20]
    got = _run(spark, xs, dixon_q)
    assert got == py_dixon(xs)
    assert got["q_min_ppm"] == 0 and got["q_max_ppm"] == 0


def test_dixon_reflection_swaps_ends(spark):
    a = _run(spark, MIXED, dixon_q)
    b = _run(spark, [-v for v in MIXED], dixon_q)
    assert a["q_min_ppm"] == b["q_max_ppm"]
    assert a["q_max_ppm"] == b["q_min_ppm"]


def test_dixon_null_gates(spark):
    assert _run(spark, [3, 3, 3], dixon_q)["q_min_ppm"] is None
    got = _run(spark, [1, 9], dixon_q)
    assert got["q_min_ppm"] is None and got["q_max_ppm"] is None
