"""Gates for evaluation/scaletests.py: Ansari-Bradley and Mood scale
tests against an exact Fraction replay of the finite-population
linear-rank moments (ties via average ranks), the float z^2
cross-check, the identical-multisets exact-zero lane, a planted
dispersion difference both tests must flag (with opposite t_stat
directions vs expectation), constant-data and empty-group NULLs,
and location-shift robustness (pure median shift stays quiet)."""

from __future__ import annotations

from fractions import Fraction

from spanluke_spark.evaluation.scaletests import ansari_bradley, mood_scale

# ---------------------------------------------------- python replay


def _double_ranks(values):
    s = sorted(values)
    dr = {}
    for v in set(values):
        less = sum(1 for u in s if u < v)
        eq = sum(1 for u in s if u == v)
        dr[v] = 2 * less + eq + 1
    return dr


def py_linear_rank(rows, kind):
    nn = len(rows)
    dr = _double_ranks([x for _, x in rows])

    def score(x):
        if kind == "ansari":
            return min(dr[x], 2 * (nn + 1) - dr[x])
        d = dr[x] - (nn + 1)
        return d * d

    m = sum(1 for g, _ in rows if g == 0)
    n = nn - m
    t = sum(score(x) for g, x in rows if g == 0)
    s_all = sum(score(x) for _, x in rows)
    s2 = sum(score(x) ** 2 for _, x in rows)
    num = (nn * t - m * s_all) ** 2 * (nn - 1)
    den = m * n * (nn * s2 - s_all * s_all)
    ok = m > 0 and n > 0 and den > 0
    return {
        "n_total": nn,
        "m": m,
        "n": n,
        "t_stat": t,
        "s_all": s_all,
        "z2_num": num,
        "z2_den": den,
        "z2_milli": num * 1000 // den if ok else None,
        "sig05": (num * 10**6 > 3841459 * den) if ok else None,
    }


def _run(spark, rows, fn):
    df = spark.createDataFrame(list(rows), "grp long, x long")
    return fn(df).collect()[0].asDict()


WIDE = [(0, (i * 17) % 40) for i in range(40)] + [
    (1, 15 + (i * 17) % 10) for i in range(40)
]


def test_ansari_matches_replay_and_float(spark):
    got = _run(spark, WIDE, ansari_bradley)
    exp = py_linear_rank(WIDE, "ansari")
    assert got == exp
    z2 = Fraction(exp["z2_num"], exp["z2_den"])
    assert abs(got["z2_milli"] - float(z2) * 1000) <= 1


def test_mood_matches_replay(spark):
    got = _run(spark, WIDE, mood_scale)
    assert got == py_linear_rank(WIDE, "mood")


def test_planted_dispersion_flagged_both(spark):
    ab = _run(spark, WIDE, ansari_bradley)
    mo = _run(spark, WIDE, mood_scale)
    assert ab["sig05"] is True and mo["sig05"] is True
    # group 0 holds the extremes: AB scores (center distance inverted)
    # run LOW, Mood squared distances run HIGH, vs E[T] = m*S/N
    assert ab["t_stat"] * ab["n_total"] < ab["m"] * ab["s_all"]
    assert mo["t_stat"] * mo["n_total"] > mo["m"] * mo["s_all"]


def test_identical_multisets_exact_zero(spark):
    rows = [(g, v) for g in (0, 1) for v in [3, 7, 7, 11, 20, 1]]
    for fn in (ansari_bradley, mood_scale):
        got = _run(spark, rows, fn)
        assert got["z2_milli"] == 0
        assert got["sig05"] is False


def test_pure_location_shift_stays_quiet(spark):
    # same shape, shifted median: scale tests should not fire
    rows = [(0, v) for v in range(20)] + [(1, v + 3) for v in range(20)]
    for fn in (ansari_bradley, mood_scale):
        got = _run(spark, rows, fn)
        assert got == py_linear_rank(rows,
            "ansari" if fn is ansari_bradley else "mood")
        assert got["sig05"] is False


def test_constant_data_null(spark):
    rows = [(i % 2, 5) for i in range(12)]
    got = _run(spark, rows, ansari_bradley)
    assert got["z2_milli"] is None and got["sig05"] is None


def test_empty_group_null(spark):
    rows = [(0, i) for i in range(10)]
    got = _run(spark, rows, mood_scale)
    assert got["n"] == 0
    assert got["z2_milli"] is None and got["sig05"] is None
