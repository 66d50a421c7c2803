"""Gates for evaluation/anova2.py: two-way ANOVA against an exact
integer replay AND float textbook SS/F, the EXACT additivity
identity sstot == ssa+ssb+ssab+sse (no epsilon), planted main
effects + interaction all firing, pure-additive design driving
f_ab to ~0, unbalanced/missing-cell and perfect-fit status lanes;
Cochran's C against replay, the equal-variances exact-1/k lane, the
inflated-group detection, unequal-size and all-constant statuses."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.evaluation.anova2 import cochran_c, two_way_anova

# ---------------------------------------------------- python replays


def py_anova(rows):
    cells = defaultdict(list)
    for fa, fb, yy in rows:
        cells[(fa, fb)].append(yy)
    a_lv = sorted({fa for fa, _, _ in rows})
    b_lv = sorted({fb for _, fb, _ in rows})
    a, b = len(a_lv), len(b_lv)
    rs = {len(v) for v in cells.values()}
    balanced = len(rs) == 1 and len(cells) == a * b
    r = min(len(v) for v in cells.values())
    t = sum(y for _, _, y in rows)
    qtot = sum(y * y for _, _, y in rows)
    c2 = sum(sum(v) ** 2 for v in cells.values())
    a2 = sum(
        sum(y for fa2, _, y in rows if fa2 == fa) ** 2 for fa in a_lv
    )
    b2 = sum(
        sum(y for _, fb2, y in rows if fb2 == fb) ** 2 for fb in b_lv
    )
    ssa = a * a2 - t * t
    ssb = b * b2 - t * t
    sscell = a * b * c2 - t * t
    sstot = a * b * r * qtot - t * t
    ssab = sscell - ssa - ssb
    sse = sstot - sscell
    out = {
        "a_levels": a, "b_levels": b, "r": r, "n": a * b * r,
        "ssa": ssa, "ssb": ssb, "ssab": ssab, "sse": sse,
    }
    if not balanced or r < 2:
        st = "unbalanced"
    elif sse == 0:
        st = "perfect_fit"
    else:
        st = "ok"
    dfe = a * b * (r - 1)
    if st == "ok":
        out["f_a_milli"] = 1000 * ssa * dfe // (sse * (a - 1))
        out["f_b_milli"] = 1000 * ssb * dfe // (sse * (b - 1))
        out["f_ab_milli"] = (
            1000 * ssab * dfe // (sse * (a - 1) * (b - 1))
        )
    else:
        out["f_a_milli"] = out["f_b_milli"] = out["f_ab_milli"] = None
    out["status"] = st
    return out


def _run_anova(spark, rows):
    df = spark.createDataFrame(list(rows), "fa long, fb long, y long")
    return two_way_anova(df).collect()[0].asDict()


def _run_cochran(spark, rows):
    df = spark.createDataFrame(list(rows), "grp long, x long")
    return cochran_c(df).collect()[0].asDict()


def _design(interact=True):
    rows = []
    for fa in range(3):
        for fb in range(4):
            for rep in range(3):
                y = 10 + 5 * fa + 3 * fb + rep % 2
                if interact:
                    y += 4 * (fa == 2) * (fb == 0)
                rows.append((fa, fb, y))
    return rows


def test_anova_matches_replay_and_float(spark):
    rows = _design()
    got = _run_anova(spark, rows)
    assert got == py_anova(rows)
    # float textbook cross-check on F_A
    n = len(rows)
    mean = sum(y for _, _, y in rows) / n
    by_a = defaultdict(list)
    for fa, _, y in rows:
        by_a[fa].append(y)
    ssa_f = sum(
        len(v) * (sum(v) / len(v) - mean) ** 2 for v in by_a.values()
    )
    assert abs(got["ssa"] / n - ssa_f) < 1e-6


def test_anova_additivity_exact(spark):
    got = _run_anova(spark, _design())
    rows = _design()
    n = len(rows)
    t = sum(y for _, _, y in rows)
    sstot = n * sum(y * y for _, _, y in rows) - t * t
    assert got["ssa"] + got["ssb"] + got["ssab"] + got["sse"] == sstot


def test_anova_effects_fire_and_additive_quiet(spark):
    with_int = _run_anova(spark, _design(interact=True))
    no_int = _run_anova(spark, _design(interact=False))
    assert with_int["f_a_milli"] > 3000
    assert with_int["f_b_milli"] > 3000
    assert with_int["f_ab_milli"] > no_int["f_ab_milli"]
    assert no_int["f_ab_milli"] == 0  # perfectly additive design


def test_anova_status_lanes(spark):
    rows = _design()[:-1]  # knock one rep out -> unbalanced
    got = _run_anova(spark, rows)
    assert got["status"] == "unbalanced" and got["f_a_milli"] is None
    missing = [rw for rw in _design() if not (rw[0] == 0 and rw[1] == 0)]
    got2 = _run_anova(spark, missing)
    assert got2["status"] == "unbalanced"
    det = [
        (fa, fb, 2 * fa + fb)
        for fa in range(2)
        for fb in range(2)
        for _ in range(2)
    ]
    got3 = _run_anova(spark, det)
    assert got3["status"] == "perfect_fit" and got3["sse"] == 0


def test_cochran_matches_replay_and_detects(spark):
    rows = [(g, 10 + (i * 3) % 5) for g in range(4) for i in range(8)]
    wild = [(9, 10 + (i * 17) % 60) for i in range(8)]
    got = _run_cochran(spark, rows + wild)
    k = 5
    per = defaultdict(list)
    for g, x in rows + wild:
        per[g].append(x)
    amax, asum = 0, 0
    for v in per.values():
        aa = len(v) * sum(x * x for x in v) - sum(v) ** 2
        amax = max(amax, aa)
        asum += aa
    assert got["c_ppm"] == amax * 10**6 // asum
    assert got["c_ppm"] > 500_000  # the wild group dominates
    assert got["status"] == "ok" and got["k"] == k


def test_cochran_equal_variances_exact(spark):
    rows = [(g, v) for g in range(5) for v in (1, 2, 3, 4)]
    got = _run_cochran(spark, rows)
    assert got["c_ppm"] == 10**6 // 5  # identical A_g, exact 1/k


def test_cochran_status_lanes(spark):
    uneq = [(0, 1), (0, 2), (1, 3)]
    assert _run_cochran(spark, uneq)["status"] == "unequal_sizes"
    const = [(g, 7) for g in range(3) for _ in range(4)]
    got = _run_cochran(spark, const)
    assert got["status"] == "all_constant" and got["c_ppm"] is None
