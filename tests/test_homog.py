"""Gates for evaluation/homog.py: Mood's median test against a
pure-python 2xk chi-square replay, the pure-dispersion EXACT-zero
lane (the Ansari-Bradley mirror), planted-shift fires, constant-data
NULL; Bartlett against a float textbook replay, the identical-groups
integer-cancellation EXACT-zero lane (n | 1000*A fixture), the
planted-variance fire with Mood's-median staying quiet (the
location/scale split), zero-variance and tiny-group lanes."""

from __future__ import annotations

import math

from spanluke_spark.evaluation.homog import bartlett, mood_median

# ---------------------------------------------------- python replays


def py_mood(rows):
    """rows: (g, x). Returns (med, chi2_milli by the per-cell milli
    identity, r_above)."""
    xs = sorted(x for _, x in rows)
    n = len(xs)
    med = xs[(n + 1) // 2 - 1]
    groups = sorted({g for g, _ in rows})
    nn = n
    a = {g: sum(1 for gg, x in rows if gg == g and x > med) for g in groups}
    ng = {g: sum(1 for gg, _ in rows if gg == g) for g in groups}
    r_above = sum(a.values())
    cells = 0
    for g in groups:
        for o, r in ((a[g], r_above), (ng[g] - a[g], nn - r_above)):
            if r > 0:
                d = nn * o - r * ng[g]
                cells += d * d * 1000 // (nn * r * ng[g])
    return med, cells, r_above


def py_bartlett(rows):
    """Float textbook Bartlett T (uncorrected num / C)."""
    from collections import defaultdict

    by_g = defaultdict(list)
    for g, x in rows:
        by_g[g].append(x)
    by_g = {g: v for g, v in by_g.items() if len(v) >= 2}
    k = len(by_g)
    n = sum(len(v) for v in by_g.values())
    s2 = {
        g: sum((x - sum(v) / len(v)) ** 2 for x in v) / (len(v) - 1)
        for g, v in by_g.items()
    }
    sp2 = sum((len(v) - 1) * s2[g] for g, v in by_g.items()) / (n - k)
    num = (n - k) * math.log(sp2) - sum(
        (len(v) - 1) * math.log(s2[g]) for g, v in by_g.items()
    )
    c = 1 + (
        sum(1 / (len(v) - 1) for v in by_g.values()) - 1 / (n - k)
    ) / (3 * (k - 1))
    return num / c


def _mk(spark, rows):
    return spark.createDataFrame(rows, "grp long, x long")


# ------------------------------------------------------- mood median


def test_mood_parity_random(spark):
    rows = [
        ((i * 7 + j) % 4, ((i * 31 + j * 17 + (i * j) % 5) % 97) - 40)
        for i in range(9)
        for j in range(11)
    ]
    med, chi2, r_above = py_mood(rows)
    got = mood_median(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.med == med
    assert got.r_above == r_above
    assert got.chi2_milli == chi2
    assert got.df == 3


def test_mood_pure_dispersion_exact_zero(spark):
    # two groups share median 0; group 1 is 10x wider. Counts above
    # the pooled median are exactly balanced -> statistic EXACTLY 0.
    g0 = [(0, v) for v in (-2, -1, 0, 1, 2) for _ in range(4)]
    g1 = [(1, v) for v in (-20, -10, 0, 10, 20) for _ in range(4)]
    got = mood_median(_mk(spark, g0 + g1)).collect()[0]
    assert got.status == "ok"
    assert got.med == 0
    assert got.chi2_milli == 0
    assert got.sig05 is False


def test_mood_planted_shift_fires_ab_quiet(spark):
    # same spread, shifted location: median test fires; the
    # Ansari-Bradley scale lane on the same data stays quiet.
    from spanluke_spark.evaluation.scaletests import ansari_bradley

    g0 = [(0, v) for v in range(0, 20)]
    g1 = [(1, v + 40) for v in range(0, 20)]
    df = _mk(spark, g0 + g1)
    got = mood_median(df).collect()[0]
    assert got.sig05 is True
    ab = ansari_bradley(df, group_col="grp", x_col="x").collect()[0]
    assert ab.sig05 is False


def test_mood_constant_null(spark):
    got = mood_median(
        _mk(spark, [(g, 7) for g in (0, 1) for _ in range(5)])
    ).collect()[0]
    assert got.status == "degenerate"
    assert got.chi2_milli is None and got.sig05 is None


def test_mood_single_group_null(spark):
    got = mood_median(_mk(spark, [(0, v) for v in range(9)])).collect()[0]
    assert got.status == "degenerate"


# ---------------------------------------------------------- bartlett


def test_bartlett_identical_groups_exact_zero(spark):
    # 4 identical groups of n=8 with 8 | 1000*A: every ratio cell's
    # pnum == pden as INTEGERS -> tnum_micro EXACTLY 0.
    vals = [1, 2, 2, 3, 5, 8, 9, 10]
    rows = [(g, v) for g in range(4) for v in vals]
    n = len(vals)
    a = n * sum(v * v for v in vals) - sum(vals) ** 2
    assert (1000 * a) % n == 0
    got = bartlett(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.tnum_micro == 0
    assert got.t_milli == 0
    assert got.sig05 is False


def test_bartlett_float_parity(spark):
    rows = [
        (g, ((g * 13 + j * 7 + (g + 1) * j * j) % 41) - 20 + 3 * g)
        for g in range(3)
        for j in range(12)
    ]
    want = py_bartlett(rows)
    got = bartlett(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert abs(got.t_milli / 1000 - want) < 2e-3


def test_bartlett_planted_variance_fires_mood_quiet(spark):
    # same median (0), group 1 spread 20x: Bartlett fires, Mood's
    # median test is EXACTLY zero — the scale/location mirror of
    # test_mood_planted_shift_fires_ab_quiet.
    g0 = [(0, v) for v in (-2, -1, 0, 1, 2) for _ in range(6)]
    g1 = [(1, v) for v in (-40, -20, 0, 20, 40) for _ in range(6)]
    df = _mk(spark, g0 + g1)
    got = bartlett(df).collect()[0]
    assert got.status == "ok" and got.sig05 is True
    md = mood_median(df).collect()[0]
    assert md.chi2_milli == 0


def test_bartlett_zero_variance_null(spark):
    rows = [(0, 5)] * 4 + [(1, v) for v in (1, 2, 3, 4)]
    got = bartlett(_mk(spark, rows)).collect()[0]
    assert got.status == "zero_variance"
    assert got.t_milli is None


def test_bartlett_tiny_groups_dropped_and_counted(spark):
    rows = [(0, v) for v in (1, 5, 9, 2)] + [(1, 3)] + [
        (2, v) for v in (2, 4, 8, 6)
    ]
    got = bartlett(_mk(spark, rows)).collect()[0]
    assert got.dropped == 1
    assert got.k == 2
    assert got.status == "ok"


def test_bartlett_single_surviving_group_null(spark):
    rows = [(0, v) for v in (1, 5, 9)] + [(1, 3)]
    got = bartlett(_mk(spark, rows)).collect()[0]
    assert got.status == "degenerate"
    assert got.t_milli is None
