"""Gates for Benjamini-Hochberg FDR (evaluation/fdr.py) and isotonic
regression (evaluation/isotonic.py): exact dyadic binomial tails
against Python math.comb, the BH step-up on a hand table (including
the step-up's non-monotone pass-through), q-value suffix-min contract;
PAVA parity vs an exact-Fraction pool-adjacent-violators replay,
monotonicity, pooling semantics, and the already-monotone identity."""

from __future__ import annotations

import hashlib
import math
from fractions import Fraction

from spanluke_spark.evaluation.fdr import bh_fdr
from spanluke_spark.evaluation.isotonic import isotonic_fit


def h(*xs) -> int:
    return int.from_bytes(
        hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
    )


def py_bh(stats, alpha=Fraction(1, 10)):
    """stats: {grp: (n, x)} -> {grp: (p, rank, reject)} exact."""
    ps = {
        g: Fraction(sum(math.comb(n, j) for j in range(x, n + 1)), 2**n)
        for g, (n, x) in stats.items()
    }
    order = sorted(ps, key=lambda g: (ps[g], g))
    m = len(order)
    kstar = 0
    for i, g in enumerate(order, 1):
        if ps[g] <= Fraction(i, m) * alpha:
            kstar = i
    return {
        g: (ps[g], i, i <= kstar) for i, g in enumerate(order, 1)
    }


def test_bh_exact_binomial_tails_and_stepup(spark):
    # 12 groups, 20 trials each; failures planted per-group
    rows = []
    fails = {g: 10 + (g % 4) * 3 for g in range(12)}  # 10,13,16,19
    for g, x in fails.items():
        rows += [(g, t < x) for t in range(20)]
    df = spark.createDataFrame(rows, "grp int, fail boolean")
    got = {r["grp"]: r for r in bh_fdr(df).collect()}
    exp = py_bh({g: (20, x) for g, x in fails.items()})
    assert len(got) == 12
    for g, (p, rank, reject) in exp.items():
        r = got[g]
        assert Fraction(r["p_num"], r["p_den"]) == p, g
        assert (r["rank"], r["reject"]) == (rank, reject), g
    # planted structure: x=19 groups must reject, x=10 groups must not
    for g in range(12):
        if fails[g] == 19:
            assert got[g]["reject"]
        if fails[g] == 10:
            assert not got[g]["reject"]


def test_bh_qvalue_suffix_min_contract(spark):
    rows = []
    fails = {0: 18, 1: 14, 2: 11}
    for g, x in fails.items():
        rows += [(g, t < x) for t in range(20)]
    df = spark.createDataFrame(rows, "grp int, fail boolean")
    got = sorted(bh_fdr(df).collect(), key=lambda r: r["rank"])
    m = 3
    terms = [
        m * (r["p_num"] * 10**6 // r["p_den"]) // r["rank"] for r in got
    ]
    for i, r in enumerate(got):
        assert r["qval_ppm"] == min(terms[i:]), i
    # q-values are nondecreasing in rank and <= 1e6
    qs = [r["qval_ppm"] for r in got]
    assert qs == sorted(qs) and qs[-1] <= 1_000_000


def test_bh_all_null_rejects_nothing(spark):
    rows = []
    for g in range(8):
        rows += [(g, (h("f", g, t) % 20) < 9) for t in range(20)]
    df = spark.createDataFrame(rows, "grp int, fail boolean")
    got = bh_fdr(df).collect()
    exp = py_bh(
        {
            g: (20, sum((h("f", g, t) % 20) < 9 for t in range(20)))
            for g in range(8)
        }
    )
    for r in got:
        assert r["reject"] == exp[r["grp"]][2]
    assert not any(r["reject"] for r in got)  # near-null everywhere


def py_pava(ws, ys):
    """Exact-Fraction pool-adjacent-violators; returns per-bin Fraction."""
    blocks = [[Fraction(y), Fraction(w), 1] for w, y in zip(ws, ys)]
    out = []
    for b in blocks:
        out.append(b)
        while len(out) >= 2 and out[-2][0] / out[-2][1] >= out[-1][0] / out[-1][1]:
            y2, w2, c2 = out.pop()
            out[-1][0] += y2
            out[-1][1] += w2
            out[-1][2] += c2
    fits = []
    for y, w, c in out:
        fits += [y / w] * c
    return fits


def test_isotonic_matches_exact_pava(spark):
    ws = [9 + h("w", i) % 8 for i in range(12)]
    ys = [h("y", i) % (w + 1) for i, w in enumerate(ws)]
    df = spark.createDataFrame(
        list(zip(range(1, 13), ws, ys)), "bin int, w int, y int"
    )
    got = sorted(isotonic_fit(df).collect(), key=lambda r: r["bin"])
    exp = py_pava(ws, ys)
    for r, f in zip(got, exp):
        assert Fraction(r["fit_num"], r["fit_den"]) == f, r["bin"]
        assert r["fit_ppm"] == f.numerator * 10**6 // f.denominator
    fits = [Fraction(r["fit_num"], r["fit_den"]) for r in got]
    assert fits == sorted(fits)  # nondecreasing by construction


def test_isotonic_pools_violators_exactly(spark):
    # rates 0.2, 0.8, 0.4 -> middle two pool to 6/10
    df = spark.createDataFrame(
        [(1, 5, 1), (2, 5, 4), (3, 5, 2)], "bin int, w int, y int"
    )
    got = {r["bin"]: r for r in isotonic_fit(df).collect()}
    assert (got[1]["fit_num"], got[1]["fit_den"]) == (1, 5)
    assert Fraction(got[2]["fit_num"], got[2]["fit_den"]) == Fraction(6, 10)
    assert Fraction(got[3]["fit_num"], got[3]["fit_den"]) == Fraction(6, 10)


def test_isotonic_identity_on_monotone_input(spark):
    df = spark.createDataFrame(
        [(i, 10, i) for i in range(1, 8)], "bin int, w int, y int"
    )
    got = sorted(isotonic_fit(df).collect(), key=lambda r: r["bin"])
    for r in got:
        assert Fraction(r["fit_num"], r["fit_den"]) == Fraction(r["y"], 10)
        assert r["rate_ppm"] == r["fit_ppm"]
