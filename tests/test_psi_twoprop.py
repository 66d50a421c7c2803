"""Gates for PSI (textops/psi.py) and the two-proportion z-test
(evaluation/proportions.py): PSI against a bit-exact replay AND a
float definition cross-check, identical-distributions exact zero,
symmetry, whole-sample duplication exactness, the skip-and-count
undefined-bucket contract, planted shift crossing the 0.25 band;
two-proportion against replay AND float, the exact Pearson-chi2
identity, the N/(N-1) Cochran-Armitage bridge, group-swap
antisymmetry, planted lift vs flat null, degenerate-pool NULL."""

from __future__ import annotations

import math
from collections import Counter

from spanluke_spark.evaluation.proportions import two_proportion_z
from spanluke_spark.textops.psi import psi

# ---------------------------------------------------- python replays


def py_psi(ref, cur):
    ca, cb = Counter(ref), Counter(cur)
    na, nb = len(ref), len(cur)
    buckets = set(ca) | set(cb)
    cell_sum = 0
    undef = 0
    for k in buckets:
        a, b = ca.get(k, 0), cb.get(k, 0)
        if a > 0 and b > 0:
            cell_sum += (b * na - a * nb) * round(
                math.log((b * na) / (a * nb)) * 10**6
            )
        else:
            undef += 1
    ppm = cell_sum // (na * nb) if na and nb else None
    band = (
        None if ppm is None
        else "stable" if ppm < 100_000
        else "moderate_shift" if ppm < 250_000 else "significant_shift"
    )
    return {
        "n_ref": na, "n_cur": nb, "n_buckets": len(buckets),
        "n_undefined": undef, "psi_ppm": ppm, "band": band,
    }


def py_2prop(rows, crit_milli=3841):
    n1 = sum(1 for g, _ in rows if g == 0)
    n2 = sum(1 for g, _ in rows if g == 1)
    a = sum(1 for g, y in rows if g == 0 and y)
    b = sum(1 for g, y in rows if g == 1 and y)
    dev = b * n1 - a * n2
    d = n1 * n2 * (a + b) * (n1 + n2 - a - b)
    if d <= 0:
        z2 = direction = sig = None
    else:
        z2 = 1000 * (n1 + n2) * dev * dev // d
        direction = (
            "treatment_higher" if dev > 0
            else "treatment_lower" if dev < 0 else "exact_expectation"
        )
        sig = z2 >= crit_milli
    return {
        "n1": n1, "n2": n2, "a": a, "b": b, "dev": dev,
        "z2_milli": z2, "direction": direction, "sig": sig,
    }


def _run_psi(spark, ref, cur):
    r = spark.createDataFrame([(x,) for x in ref], "bucket long")
    c = spark.createDataFrame([(x,) for x in cur], "bucket long")
    return psi(r, c).collect()[0].asDict()


def _run_2p(spark, rows):
    df = spark.createDataFrame(rows, "grp long, converted boolean")
    return two_proportion_z(df).collect()[0].asDict()


REF = [((e * 13) % 100) // 10 for e in range(0, 800, 2)]
CUR = [min(9, ((e * 13) % 100 + 25) // 10) for e in range(1, 800, 2)]


# ----------------------------------------------------------------- psi


def test_psi_matches_replay_and_float(spark):
    got = _run_psi(spark, REF, CUR)
    exp = py_psi(REF, CUR)
    assert got == exp
    # float definition: sum (q-p) ln(q/p) over shared buckets
    ca, cb = Counter(REF), Counter(CUR)
    na, nb = len(REF), len(CUR)
    f = sum(
        (cb[k] / nb - ca[k] / na)
        * math.log((cb[k] / nb) / (ca[k] / na))
        for k in set(ca) & set(cb)
        if ca[k] and cb[k]
    )
    assert abs(got["psi_ppm"] - f * 10**6) <= 5


def test_psi_identity_zero_and_symmetry(spark):
    same = _run_psi(spark, REF, list(REF))
    assert same["psi_ppm"] == 0 and same["band"] == "stable"
    a = _run_psi(spark, REF, CUR)
    b = _run_psi(spark, CUR, REF)
    assert a["psi_ppm"] == b["psi_ppm"]


def test_psi_duplication_exact(spark):
    """cur -> cur + cur doubles cell_sum AND the denominator: the
    truncated ppm is EXACTLY unchanged."""
    a = _run_psi(spark, REF, CUR)
    b = _run_psi(spark, REF, CUR + CUR)
    assert a["psi_ppm"] == b["psi_ppm"]


def test_psi_skip_and_count(spark):
    ref = [0] * 10 + [1] * 10 + [2] * 5
    cur = [0] * 12 + [1] * 8 + [9] * 5  # bucket 2 and 9 one-sided
    got = _run_psi(spark, ref, cur)
    assert got["n_undefined"] == 2 and got["n_buckets"] == 4


def test_psi_planted_shift_band(spark):
    got = _run_psi(spark, REF, CUR)
    assert got["psi_ppm"] > 250_000
    assert got["band"] == "significant_shift"


# --------------------------------------------------------------- 2prop

ROWS = [(e % 2, (e * 13) % 100 < 40 + 12 * (e % 2)) for e in range(600)]


def test_2prop_matches_replay_and_float(spark):
    got = _run_2p(spark, ROWS)
    exp = py_2prop(ROWS)
    assert got == exp
    n1, n2, a, b = exp["n1"], exp["n2"], exp["a"], exp["b"]
    n = n1 + n2
    p = (a + b) / n
    z2 = (b / n2 - a / n1) ** 2 / (p * (1 - p) * (1 / n1 + 1 / n2))
    assert got["z2_milli"] == int(z2 * 1000)


def test_2prop_equals_pearson_chi2(spark):
    got = _run_2p(spark, ROWS)
    n1, n2 = got["n1"], got["n2"]
    a, b = got["a"], got["b"]
    c, d = n1 - a, n2 - b
    n = n1 + n2
    chi2 = (
        n * (a * d - c * b) ** 2
        / ((a + b) * (c + d) * (a + c) * (b + d))
    )
    assert got["z2_milli"] == int(chi2 * 1000)


def test_2prop_ca_bridge(spark):
    """z^2 == N/(N-1) * Cochran-Armitage at scores {0,1}."""
    from spanluke_spark.evaluation.trendtests import cochran_armitage

    df = spark.createDataFrame(
        [(g, bool(y)) for g, y in ROWS], "score long, outcome boolean"
    )
    ca = cochran_armitage(df).collect()[0].asDict()
    z = _run_2p(spark, ROWS)
    n = z["n1"] + z["n2"]
    assert abs(z["z2_milli"] - ca["z2_milli"] * n / (n - 1)) <= 1


def test_2prop_swap_and_null(spark):
    sw = _run_2p(spark, [(1 - g, y) for g, y in ROWS])
    base = _run_2p(spark, ROWS)
    assert sw["z2_milli"] == base["z2_milli"]
    assert sw["dev"] == -base["dev"]
    assert base["sig"] is True
    flat = [(e % 2, (e * 13) % 100 < 50) for e in range(600)]
    assert _run_2p(spark, flat)["sig"] is False
    degen = [(e % 2, True) for e in range(40)]
    assert _run_2p(spark, degen)["z2_milli"] is None
