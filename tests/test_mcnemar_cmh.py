"""Gates for McNemar's exact paired test (evaluation/mcnemar.py) and
Cochran-Mantel-Haenszel (evaluation/cmh.py): exact dyadic two-sided
tails against Fraction/math.comb, the clamp-at-1 and nd = 0 edges,
a/b symmetry; CMH against a bit-exact Python replay of the milli
quantization, the Simpson confounding fixture (stratified test must
NOT fire where the pooled table screams), a planted-lift rejection,
and a float cross-check of the quantized statistic."""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

from spanluke_spark.evaluation.cmh import cmh_test
from spanluke_spark.evaluation.mcnemar import mcnemar_exact


def h(*xs) -> int:
    return int.from_bytes(
        hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
    )


# ------------------------------------------------------------- McNemar


def py_mcnemar(n01: int, n10: int) -> Fraction:
    nd, k = n01 + n10, min(n01, n10)
    if nd == 0:
        return Fraction(1)
    tail = sum(math.comb(nd, j) for j in range(k + 1))
    return min(Fraction(1), Fraction(2 * tail, 2**nd))


def _run_mc(spark, rows, **kw):
    df = spark.createDataFrame(rows, "grp int, a_ok boolean, b_ok boolean")
    return {r["grp"]: r for r in mcnemar_exact(df, **kw).collect()}


def test_mcnemar_exact_p_matches_fraction_replay(spark):
    rows = []
    for g in range(10):
        for t in range(30):
            rows.append(
                (g, h("a", g, t) % 10 < 6, h("b", g, t) % 10 < 3 + g % 5)
            )
    got = _run_mc(spark, rows)
    for g in range(10):
        n01 = sum(1 for gg, a, b in rows if gg == g and not a and b)
        n10 = sum(1 for gg, a, b in rows if gg == g and a and not b)
        r = got[g]
        assert (r["n01"], r["n10"]) == (n01, n10)
        assert Fraction(r["p_num"], r["p_den"]) == py_mcnemar(n01, n10), g
        assert r["p_ppm"] == r["p_num"] * 10**6 // r["p_den"]
        assert r["signif"] == (Fraction(r["p_num"], r["p_den"]) <= Fraction(1, 20))


def test_mcnemar_hand_anchor_and_edges(spark):
    # grp 0: n01=1, n10=8 -> p = 2*(1+9)/512 = 5/128 (signif at 1/20)
    rows = [(0, False, True)] + [(0, True, False)] * 8
    # grp 1: fully concordant -> nd=0 -> p = 1
    rows += [(1, True, True)] * 5 + [(1, False, False)] * 5
    # grp 2: balanced discordants 3/3 -> two-sided tail clamps to 1
    rows += [(2, False, True)] * 3 + [(2, True, False)] * 3
    got = _run_mc(spark, rows)
    assert (got[0]["p_num"], got[0]["p_den"]) == (20, 512)
    assert got[0]["signif"]
    assert (got[1]["nd"], got[1]["p_num"], got[1]["p_den"]) == (0, 1, 1)
    assert not got[1]["signif"]
    assert Fraction(got[2]["p_num"], got[2]["p_den"]) == 1


def test_mcnemar_symmetric_in_classifier_order(spark):
    rows = [(0, h("a", t) % 3 < 1, h("b", t) % 3 < 2) for t in range(36)]
    fwd = _run_mc(spark, rows)[0]
    rev = _run_mc(spark, [(g, b, a) for g, a, b in rows])[0]
    assert (fwd["p_num"], fwd["p_den"]) == (rev["p_num"], rev["p_den"])
    assert (fwd["n01"], fwd["n10"]) == (rev["n10"], rev["n01"])


# ----------------------------------------------------------------- CMH


def py_cmh(rows):
    tabs = {}
    for s, e, o in rows:
        t = tabs.setdefault(s, [0, 0, 0, 0])
        t[0 if e and o else 1 if e else 2 if o else 3] += 1
    out = dict(k_strata=0, total=0, s_dev_milli=0, v_milli=0,
               s_ad_milli=0, s_bc_milli=0)
    for a, b, c, d in tabs.values():
        t = a + b + c + d
        if t < 2:
            continue
        out["k_strata"] += 1
        out["total"] += t
        dev = a * t - (a + b) * (a + c)
        mag = abs(dev) * 1000 // t
        out["s_dev_milli"] += -mag if dev < 0 else mag
        out["v_milli"] += (a + b) * (c + d) * (a + c) * (b + d) * 1000 // (
            t * t * (t - 1)
        )
        out["s_ad_milli"] += a * d * 1000 // t
        out["s_bc_milli"] += b * c * 1000 // t
    out["chi2_milli"] = (
        out["s_dev_milli"] ** 2 // out["v_milli"] if out["v_milli"] > 0 else None
    )
    out["sig95"] = (out["chi2_milli"] or 0) >= 3841
    out["sig99"] = (out["chi2_milli"] or 0) >= 6635
    out["or_ppm"] = (
        out["s_ad_milli"] * 10**6 // out["s_bc_milli"]
        if out["s_bc_milli"] > 0
        else None
    )
    return out


def _run_cmh(spark, rows):
    df = spark.createDataFrame(
        rows, "stratum int, exposed boolean, outcome boolean"
    )
    return cmh_test(df).collect()[0].asDict()


def test_cmh_matches_python_milli_replay(spark):
    rows = [
        (s, h("e", s, t) % 10 < 5, h("o", s, t) % 10 < 3 + s % 4)
        for s in range(8)
        for t in range(40)
    ]
    got = _run_cmh(spark, rows)
    assert got == py_cmh(rows)


def test_cmh_simpson_confounding_does_not_fire(spark):
    # stratum 0: mostly exposed AND mostly positive, independent inside
    # stratum 1: mostly unexposed AND mostly negative, independent inside
    # pooled table shows a strong spurious association; CMH must not.
    rows = []
    for t in range(80):
        e = t % 4 != 0  # 75% exposed
        o = (t // 4) % 4 != 0  # 75% outcome, from an independent digit
        rows.append((0, e, o))
    for t in range(80):
        e = t % 4 == 0  # 25% exposed
        o = (t // 4) % 4 == 0  # 25% outcome, independent digit again
        rows.append((1, e, o))
    got = _run_cmh(spark, rows)
    assert not got["sig95"]
    # pooled 2x2 would fire: check its chi2 > 3.841 to prove the trap
    a = sum(1 for _, e, o in rows if e and o)
    b = sum(1 for _, e, o in rows if e and not o)
    c = sum(1 for _, e, o in rows if not e and o)
    d = sum(1 for _, e, o in rows if not e and not o)
    t = a + b + c + d
    pooled = t * (a * d - b * c) ** 2 / ((a + b) * (c + d) * (a + c) * (b + d))
    assert pooled > 3.841


def test_cmh_planted_lift_fires_and_matches_float(spark):
    rows = [
        (s, h("e2", s, t) % 2 == 0,
         h("o2", s, t) % 100 < 30 + (40 if h("e2", s, t) % 2 == 0 else 0))
        for s in range(6)
        for t in range(60)
    ]
    got = _run_cmh(spark, rows)
    assert got["sig99"] and got["or_ppm"] > 1_000_000
    # float cross-check of the quantized statistic
    tabs = {}
    for s, e, o in rows:
        tt = tabs.setdefault(s, [0, 0, 0, 0])
        tt[0 if e and o else 1 if e else 2 if o else 3] += 1
    S = sum(
        a - (a + b) * (a + c) / (a + b + c + d)
        for a, b, c, d in tabs.values()
    )
    V = sum(
        (a + b) * (c + d) * (a + c) * (b + d)
        / ((a + b + c + d) ** 2 * (a + b + c + d - 1))
        for a, b, c, d in tabs.values()
    )
    assert abs(got["chi2_milli"] / 1000 - S * S / V) < 0.1
