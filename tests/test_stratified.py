"""Gates for evaluation/stratified.py: van Elteren against an exact
quantized-cell replay AND the float locally-best-weighted statistic,
the single-stratum collapse toward the plain rank z^2, a planted
consistent stratified shift firing where the POOLED (stratum-blind)
test is diluted by stratum offsets, identical-within-strata
quietness, degenerate skip-and-count; MH common OR against replay,
the homogeneous-OR recovery lane, and the kidney-stone contrast
(MH stays >1 with the strata while the crude OR flips below 1)."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.evaluation.stratified import mh_common_or, van_elteren

# ---------------------------------------------------- python replays


def _drs(values):
    out = {}
    for v in set(values):
        less = sum(1 for u in values if u < v)
        eq = sum(1 for u in values if u == v)
        out[v] = 2 * less + eq + 1
    return out


def py_van_elteren(rows):
    strata = defaultdict(list)
    for st, g, x in rows:
        strata[st].append((g, x))
    k = len(strata)
    degen = 0
    dev = var = 0
    for members in strata.values():
        vals = [x for _, x in members]
        dr = _drs(vals)
        m = sum(1 for g, _ in members if g == 0)
        n = len(members) - m
        nn = len(members)
        dsum = sum(dr[x] for _, x in members)
        d2sum = sum(dr[x] ** 2 for _, x in members)
        svar = nn * d2sum - dsum * dsum
        if m == 0 or n == 0 or svar <= 0:
            degen += 1
            continue
        w2 = sum(dr[x] for g, x in members if g == 0)
        dn = w2 - m * (nn + 1)
        mag = abs(dn) * 1000 // (nn + 1)
        dev += -mag if dn < 0 else mag
        var += (
            10**6 * m * n * svar
            // (nn * nn * (nn - 1) * (nn + 1) * (nn + 1))
        )
    out = {
        "k_strata": k,
        "n_degenerate": degen,
        "dev_milli": dev,
        "var_micro": var,
    }
    if var > 0:
        z2 = 1000 * dev * dev // var
        out["z2_milli"] = z2
        out["sig05"] = z2 > 3841
    else:
        out["z2_milli"] = None
        out["sig05"] = None
    return out


def py_mh(tables):
    numc = denc = ta = tb = tc = td = 0
    for a, b, c, d in tables:
        nt = a + b + c + d
        if nt > 0:
            numc += 1000 * a * d // nt
            denc += 1000 * b * c // nt
        ta, tb, tc, td = ta + a, tb + b, tc + c, td + d
    return {
        "k_strata": len(tables),
        "mh_num_milli": numc,
        "mh_den_milli": denc,
        "or_mh_ppm": numc * 10**6 // denc if denc > 0 else None,
        "crude_or_ppm": (
            ta * td * 10**6 // (tb * tc) if tb * tc > 0 else None
        ),
    }


def _run_ve(spark, rows):
    df = spark.createDataFrame(
        list(rows), "stratum string, grp long, x long"
    )
    return van_elteren(df).collect()[0].asDict()


def _run_mh(spark, tables):
    rows = []
    for i, (a, b, c, d) in enumerate(tables):
        st = f"s{i}"
        rows += (
            [(st, True, True)] * a
            + [(st, True, False)] * b
            + [(st, False, True)] * c
            + [(st, False, False)] * d
        )
    df = spark.createDataFrame(
        rows, "stratum string, exposed boolean, positive boolean"
    )
    return mh_common_or(df).collect()[0].asDict()


def _shifted(offsets, delta):
    """per-stratum baselines + consistent group-0 shift of delta"""
    rows = []
    for si, off in enumerate(offsets):
        for i in range(12):
            rows.append((f"s{si}", 0, off + delta + (i * 3) % 5))
            rows.append((f"s{si}", 1, off + (i * 7) % 5))
    return rows


def test_ve_matches_replay_and_float(spark):
    rows = _shifted([0, 40, 95], 3)
    got = _run_ve(spark, rows)
    assert got == py_van_elteren(rows)
    # float cross-check of the weighted statistic
    import math
    exp = py_van_elteren(rows)
    z2_f = (exp["dev_milli"] / 1000) ** 2 / (exp["var_micro"] / 10**6)
    assert abs(got["z2_milli"] - z2_f * 1000) <= 20  # cell quantization
    assert math.isfinite(z2_f)


def test_ve_stratified_shift_fires(spark):
    rows = _shifted([0, 40, 95], 3)
    got = _run_ve(spark, rows)
    assert got["sig05"] is True
    # a stratum-blind Mann-Whitney-style view is DILUTED by the
    # baselines: the stratified z^2 dominates the pooled one
    pooled = [("all", g, x) for _, g, x in rows]
    got_pooled = _run_ve(spark, pooled)
    assert got["z2_milli"] > got_pooled["z2_milli"]


def test_ve_identical_within_strata_quiet(spark):
    rows = []
    for si in range(3):
        for i in range(10):
            rows.append((f"s{si}", 0, si * 50 + (i * 3) % 7))
            rows.append((f"s{si}", 1, si * 50 + (i * 3) % 7))
    got = _run_ve(spark, rows)
    assert got == py_van_elteren(rows)
    assert got["sig05"] is False


def test_ve_degenerate_skip_and_count(spark):
    rows = _shifted([0], 3) + [("lonely", 0, 5), ("flat", 0, 1),
                               ("flat", 1, 1)]
    got = _run_ve(spark, rows)
    assert got == py_van_elteren(rows)
    assert got["n_degenerate"] == 2
    assert got["z2_milli"] is not None


def test_mh_matches_replay_and_homogeneous(spark):
    tables = [(20, 10, 10, 20), (8, 4, 4, 8), (40, 20, 20, 40)]
    got = _run_mh(spark, tables)
    assert got == py_mh(tables)
    # every stratum has OR == 4: MH recovers ~4.0
    assert abs(got["or_mh_ppm"] - 4_000_000) < 40_000


def test_mh_kidney_stone_contrast(spark):
    tables = [(81, 6, 234, 36), (192, 71, 55, 25)]
    got = _run_mh(spark, tables)
    assert got == py_mh(tables)
    assert got["or_mh_ppm"] > 10**6  # stratum-consistent: A better
    assert got["crude_or_ppm"] < 10**6  # the confounded pooled flip
