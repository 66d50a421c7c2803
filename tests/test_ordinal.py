"""Gates for the Jonckheere-Terpstra trend test and Cliff's delta /
Vargha-Delaney A (evaluation/ordinal.py): JT against a bit-exact
definitional pair-count replay AND a float Hollander-Wolfe z^2
cross-check, the no-tie variance identity n(n-1)(2n+5) ==
n^2(2n+3) - 5n summed, reversal antisymmetry (mapping grp -> k-1-grp
flips h, same z^2), perfect separation significant, all-tied NULL;
Cliff's delta against a definitional gt/lt/eq replay, complete
dominance == exactly 1e6, identical groups == 0, group swap negates,
and the A == (delta+1)/2 identity within 1 ppm."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.evaluation.ordinal import (
    cliffs_delta,
    jonckheere_terpstra,
)

# ---------------------------------------------------- python replays


def py_jt(rows, crit_milli=3841):
    groups = sorted(set(g for g, _ in rows))
    data = {g: [v for gg, v in rows if gg == g] for g in groups}
    j2 = 0
    for i, u in enumerate(groups):
        for v in groups[i + 1:]:
            for x in data[u]:
                for y in data[v]:
                    if x < y:
                        j2 += 2
                    elif x == y:
                        j2 += 1
    n = len(rows)
    ni = [len(data[g]) for g in groups]
    h = j2 - (n * n - sum(a * a for a in ni)) // 2
    t = list(Counter(v for _, v in rows).values())
    v1 = (
        n * (n - 1) * (2 * n + 5)
        - sum(a * (a - 1) * (2 * a + 5) for a in ni)
        - sum(a * (a - 1) * (2 * a + 5) for a in t)
    )
    v2 = sum(a * (a - 1) * (a - 2) for a in ni)
    v3 = sum(a * (a - 1) * (a - 2) for a in t)
    v4 = sum(a * (a - 1) for a in ni)
    v5 = sum(a * (a - 1) for a in t)
    d = v1 * n * (n - 1) * (n - 2) + 2 * v2 * v3 + 9 * (n - 2) * v4 * v5
    if d <= 0:
        z2 = direction = sig = None
    else:
        z2 = 18000 * n * (n - 1) * (n - 2) * h * h // d
        direction = (
            "increasing" if h > 0
            else "decreasing" if h < 0 else "exact_expectation"
        )
        sig = z2 >= crit_milli
    return {
        "n": n, "k": len(groups), "j2": j2, "h": h,
        "z2_milli": z2, "direction": direction, "sig": sig,
    }


def float_jt_z2(rows):
    groups = sorted(set(g for g, _ in rows))
    data = {g: [v for gg, v in rows if gg == g] for g in groups}
    j = 0.0
    for i, u in enumerate(groups):
        for v in groups[i + 1:]:
            for x in data[u]:
                for y in data[v]:
                    j += 1.0 if x < y else 0.5 if x == y else 0.0
    n = len(rows)
    ni = [len(data[g]) for g in groups]
    e = (n * n - sum(a * a for a in ni)) / 4
    t = list(Counter(v for _, v in rows).values())
    v1 = (
        n * (n - 1) * (2 * n + 5)
        - sum(a * (a - 1) * (2 * a + 5) for a in ni)
        - sum(a * (a - 1) * (2 * a + 5) for a in t)
    )
    v2 = sum(a * (a - 1) * (a - 2) for a in ni)
    v3 = sum(a * (a - 1) * (a - 2) for a in t)
    v4 = sum(a * (a - 1) for a in ni)
    v5 = sum(a * (a - 1) for a in t)
    var = (
        v1 / 72
        + v2 * v3 / (36 * n * (n - 1) * (n - 2))
        + v4 * v5 / (8 * n * (n - 1))
    )
    return (j - e) ** 2 / var


def py_cliffs(rows):
    a = [v for g, v in rows if g == 1]
    b = [v for g, v in rows if g == 0]
    gt = sum(1 for x in a for y in b if x > y)
    eq = sum(1 for x in a for y in b if x == y)
    u2 = 2 * gt + eq
    nab = len(a) * len(b)
    num = u2 - nab
    delta = (abs(num) * 10**6) // nab * (1 if num >= 0 else -1)
    a_ppm = u2 * 10**6 // (2 * nab)
    ad = abs(delta)
    mag = (
        "negligible" if ad < 147_000
        else "small" if ad < 330_000
        else "medium" if ad < 474_000 else "large"
    )
    return {
        "n_a": len(a), "n_b": len(b), "u2": u2,
        "delta_ppm": delta, "a_ppm": a_ppm, "magnitude": mag,
    }


def _run_jt(spark, rows):
    df = spark.createDataFrame(rows, "grp long, value long")
    return jonckheere_terpstra(df).collect()[0].asDict()


def _run_cliffs(spark, rows):
    df = spark.createDataFrame(rows, "grp long, value long")
    return cliffs_delta(df).collect()[0].asDict()


# -------------------------------------------------------- jonckheere


def test_jt_matches_replay_and_float(spark):
    rows = [((e * 5) % 4, ((e * 17) % 23 + 2 * ((e * 5) % 4)))
            for e in range(90)]
    got = _run_jt(spark, rows)
    assert got == py_jt(rows)
    assert got["z2_milli"] == int(float_jt_z2(rows) * 1000)


def test_jt_no_tie_variance_identity():
    """With no ties the H-W V1 collapses to the classic
    n^2(2n+3) - sum nj^2(2nj+3): n(n-1)(2n+5) == n^2(2n+3) - 5n per
    term and sum nj == n make the -5 terms cancel."""
    for n in (7, 40, 161):
        assert n * (n - 1) * (2 * n + 5) == n * n * (2 * n + 3) - 5 * n


def test_jt_planted_trend_significant(spark):
    rows = [(e % 4, (e * 17) % 40 + 3 * (e % 4)) for e in range(160)]
    got = _run_jt(spark, rows)
    assert got["sig"] is True and got["direction"] == "increasing"
    assert got["z2_milli"] == 19458  # == trunc(float z^2 * 1000)


def test_jt_null_not_significant(spark):
    rows = [(e % 4, (e * 17) % 40) for e in range(160)]
    got = _run_jt(spark, rows)
    assert got["sig"] is False


def test_jt_reversal_antisymmetry(spark):
    rows = [(e % 4, (e * 17) % 40 + 3 * (e % 4)) for e in range(160)]
    rev = [(3 - g, v) for g, v in rows]
    a, b = _run_jt(spark, rows), _run_jt(spark, rev)
    assert a["h"] == -b["h"] and a["z2_milli"] == b["z2_milli"]
    assert b["direction"] == "decreasing"


def test_jt_perfect_separation(spark):
    rows = [(e % 4, (e % 4) * 100 + e) for e in range(40)]
    got = _run_jt(spark, rows)
    assert got["sig"] is True and got["j2"] == 2 * got["h"]


def test_jt_all_tied_null(spark):
    rows = [(e % 4, 7) for e in range(40)]
    got = _run_jt(spark, rows)
    assert got["z2_milli"] is None and got["sig"] is None
    assert got["h"] == 0


# ------------------------------------------------------ cliffs delta


def test_cliffs_matches_replay(spark):
    rows = [(e % 2, (e * 7) % 30 + 5 * (e % 2)) for e in range(120)]
    assert _run_cliffs(spark, rows) == py_cliffs(rows)


def test_cliffs_complete_dominance(spark):
    rows = [(0, e) for e in range(30)] + [(1, 100 + e) for e in range(20)]
    got = _run_cliffs(spark, rows)
    assert got["delta_ppm"] == 1_000_000
    assert got["a_ppm"] == 1_000_000
    assert got["magnitude"] == "large"


def test_cliffs_identical_groups_zero(spark):
    rows = [(g, e % 10) for g in (0, 1) for e in range(40)]
    got = _run_cliffs(spark, rows)
    assert got["delta_ppm"] == 0 and got["a_ppm"] == 500_000
    assert got["magnitude"] == "negligible"


def test_cliffs_group_swap_negates(spark):
    rows = [(e % 2, (e * 7) % 30 + 5 * (e % 2)) for e in range(120)]
    sw = [(1 - g, v) for g, v in rows]
    a, b = _run_cliffs(spark, rows), _run_cliffs(spark, sw)
    assert a["delta_ppm"] == -b["delta_ppm"]


def test_cliffs_a_identity_within_1ppm(spark):
    """A == (delta + 1)/2 exactly in rationals; the two independent
    truncations stay within 1 ppm of the identity."""
    for seed in (3, 7, 11):
        rows = [(e % 2, (e * seed) % 31 + (e % 2) * (seed % 4))
                for e in range(100)]
        got = _run_cliffs(spark, rows)
        assert abs(2 * got["a_ppm"] - (got["delta_ppm"] + 10**6)) <= 2
