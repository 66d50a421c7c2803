"""Gates for evaluation/effect.py: the two-sample panel against an
exact Fraction replay AND numpy float formulas, equal-variance
equality welch_t2 == t2 (balanced groups), g2 < d2 (Hedges shrinks),
welch_df bracketing min(n1,n2)-1 <= df <= n1+n2-2, planted-shift
band labels, degenerate NULLs; the paired panel against replay, the
all-equal-shift exact lane (zero variance -> NULL with direction
kept), sign direction, and t2 == n * dz2 up to trunc."""

from __future__ import annotations

from fractions import Fraction

from spanluke_spark.evaluation.effect import paired_effect, two_sample_effect

# ---------------------------------------------------- python replays


def py_two_sample(rows):
    g1 = [x for g, x in rows if g == 0]
    g2_ = [x for g, x in rows if g != 0]
    n1, n2 = len(g1), len(g2_)
    s1, s2 = sum(g1), sum(g2_)
    q1, q2 = sum(v * v for v in g1), sum(v * v for v in g2_)
    md = s1 * n2 - s2 * n1
    a1 = n1 * q1 - s1 * s1
    a2 = n2 * q2 - s2 * s2
    pd = n2 * a1 + n1 * a2
    wd = n2 * n2 * a1 * (n2 - 1) + n1 * n1 * a2 * (n1 - 1)
    w1 = a1 * n2 * n2 * (n2 - 1)
    w2 = a2 * n1 * n1 * (n1 - 1)
    ok = n1 >= 2 and n2 >= 2
    df = n1 + n2 - 2
    out = {"n1": n1, "n2": n2, "md_num": md}
    out["d2_milli"] = (
        md * md * 1000 * df // (n1 * n2 * pd) if ok and pd > 0 else None
    )
    out["g2_milli"] = (
        md * md * 1000 * df * (4 * df - 4) ** 2
        // (n1 * n2 * pd * (4 * df - 1) ** 2)
        if ok and pd > 0
        else None
    )
    out["t2_milli"] = (
        md * md * 1000 * df // ((n1 + n2) * pd)
        if ok and pd > 0
        else None
    )
    out["welch_t2_milli"] = (
        md * md * 1000 * (n1 - 1) * (n2 - 1) // wd
        if ok and wd > 0
        else None
    )
    out["welch_df_milli"] = (
        (w1 + w2) ** 2 * (n1 - 1) * (n2 - 1) * 1000
        // ((n2 - 1) * w1 * w1 + (n1 - 1) * w2 * w2)
        if ok and w1 + w2 > 0 and (a1 > 0 or a2 > 0)
        else None
    )
    d2 = out["d2_milli"]
    out["band"] = (
        None
        if d2 is None
        else "negligible"
        if d2 < 40
        else "small"
        if d2 < 250
        else "medium"
        if d2 < 640
        else "large"
    )
    out["direction"] = (
        "group0_higher" if md > 0 else "group1_higher" if md < 0
        else "equal_means"
    )
    return out


def _run_ts(spark, rows):
    df = spark.createDataFrame(list(rows), "grp long, x long")
    return two_sample_effect(df).collect()[0].asDict()


def _run_pair(spark, pairs):
    df = spark.createDataFrame(list(pairs), "before long, after long")
    return paired_effect(df).collect()[0].asDict()


SHIFTED = [(0, 20 + (i * 7) % 9) for i in range(30)] + [
    (1, 14 + (i * 5) % 9) for i in range(24)
]


def test_two_sample_matches_replay_and_float(spark):
    got = _run_ts(spark, SHIFTED)
    assert got == py_two_sample(SHIFTED)
    g1 = [x for g, x in SHIFTED if g == 0]
    g2_ = [x for g, x in SHIFTED if g != 0]
    n1, n2 = len(g1), len(g2_)
    m1 = sum(g1) / n1
    m2 = sum(g2_) / n2
    v1 = sum((v - m1) ** 2 for v in g1) / (n1 - 1)
    v2 = sum((v - m2) ** 2 for v in g2_) / (n2 - 1)
    sp2 = ((n1 - 1) * v1 + (n2 - 1) * v2) / (n1 + n2 - 2)
    d2 = (m1 - m2) ** 2 / sp2
    tw2 = (m1 - m2) ** 2 / (v1 / n1 + v2 / n2)
    dfw = (v1 / n1 + v2 / n2) ** 2 / (
        (v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1)
    )
    assert abs(got["d2_milli"] - d2 * 1000) <= 1
    assert abs(got["welch_t2_milli"] - tw2 * 1000) <= 1
    assert abs(got["welch_df_milli"] - dfw * 1000) <= 1


def test_two_sample_identities(spark):
    got = _run_ts(spark, SHIFTED)
    n1, n2 = got["n1"], got["n2"]
    # Hedges shrinks; Welch df bracketed by the classic bounds
    assert got["g2_milli"] < got["d2_milli"]
    assert (min(n1, n2) - 1) * 1000 <= got["welch_df_milli"]
    assert got["welch_df_milli"] <= (n1 + n2 - 2) * 1000
    assert got["band"] == "large" and got["direction"] == "group0_higher"


def test_two_sample_balanced_equal_var_welch_equals_pooled(spark):
    # identical shapes, shifted: balanced n, equal variances
    rows = [(0, 10 + (i * 3) % 7) for i in range(20)] + [
        (1, 13 + (i * 3) % 7) for i in range(20)
    ]
    got = _run_ts(spark, rows)
    assert abs(got["welch_t2_milli"] - got["t2_milli"]) <= 1
    assert got["welch_df_milli"] == (len(rows) - 2) * 1000


def test_two_sample_equal_groups_zero_effect(spark):
    rows = [(g, 5 + (i * 3) % 4) for g in (0, 1) for i in range(12)]
    got = _run_ts(spark, rows)
    assert got["d2_milli"] == 0 and got["band"] == "negligible"
    assert got["direction"] == "equal_means"


def test_two_sample_degenerate_null(spark):
    got = _run_ts(spark, [(0, 5), (1, 7), (1, 9)])
    assert got["d2_milli"] is None  # n1 < 2
    both_const = [(0, 4)] * 5 + [(1, 9)] * 5
    got2 = _run_ts(spark, both_const)
    assert got2["d2_milli"] is None  # zero pooled variance
    assert got2["welch_df_milli"] is None


def test_paired_replay_and_identity(spark):
    pairs = [(10 + (i * 3) % 8, 12 + (i * 5) % 9) for i in range(40)]
    got = _run_pair(spark, pairs)
    n = len(pairs)
    sd = sum(b - a for a, b in pairs)
    qd = sum((b - a) ** 2 for a, b in pairs)
    t2 = sd * sd * 1000 * (n - 1) // (n * qd - sd * sd)
    dz2 = sd * sd * 1000 * (n - 1) // (n * (n * qd - sd * sd))
    assert got["t2_milli"] == t2 and got["dz2_milli"] == dz2
    # t2 == n * dz2 up to the one-trunc gap
    assert 0 <= got["t2_milli"] - n * got["dz2_milli"] < n
    assert got["direction"] == "increased"


def test_paired_constant_shift_null_with_direction(spark):
    got = _run_pair(spark, [(i, i + 3) for i in range(10)])
    assert got["t2_milli"] is None  # zero variance of differences
    assert got["direction"] == "increased"
    flat = _run_pair(spark, [(i, i) for i in range(10)])
    assert flat["direction"] == "no_net_change"
