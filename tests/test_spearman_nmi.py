"""Gates for Spearman's rho (evaluation/spearman.py) and NMI
(evaluation/nmi.py): Spearman against an exact-Fraction
Pearson-on-average-ranks replay (two-stage trunc proved within 2 ppm
of the exact rho^2) plus a bit-exact integer replay of the double-rank
pipeline, |rho| = 1 on monotone transforms that preserve tie groups,
sign flip on reversal, constant-column NULL; NMI against a
half-away-round ln-ppm replay, the identical-clusterings == 1e6 exact
lane, the exact-independence-grid == 0 lane, label-permutation
invariance, and the both-constant NULL contract."""

from __future__ import annotations

import math
from collections import Counter
from fractions import Fraction

from spanluke_spark.evaluation.nmi import nmi
from spanluke_spark.evaluation.spearman import spearman_rho


def rnd(x: float) -> int:
    """round-half-away-from-zero (Spark/DuckDB round), NOT banker's."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


# ------------------------------------------------------------- spearman


def double_ranks(vals):
    order = sorted(vals)
    first = {}
    for i, v in enumerate(order):
        first.setdefault(v, i + 1)
    cnt = Counter(order)
    return [2 * first[v] + cnt[v] - 1 for v in vals]


def py_spearman(pairs):
    a = double_ranks([x for x, _ in pairs])
    b = double_ranks([y for _, y in pairs])
    n = len(pairs)
    sa, sb = sum(a), sum(b)
    sab = sum(x * y for x, y in zip(a, b))
    saa, sbb = sum(x * x for x in a), sum(y * y for y in b)
    num = n * sab - sa * sb
    d2x, d2y = n * saa - sa * sa, n * sbb - sb * sb
    rho2 = (
        None
        if d2x == 0 or d2y == 0
        else (num * num) // d2x * 1_000_000 // d2y
    )
    sign = 1 if num > 0 else -1 if num < 0 else 0
    return {
        "n": n,
        "num": num,
        "den2x": d2x,
        "den2y": d2y,
        "rho2_ppm": rho2,
        "rho_sign": sign,
    }


def _run_rho(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    return spearman_rho(df).collect()[0].asDict()


def test_spearman_matches_integer_replay_and_fraction(spark):
    pairs = [((i * 7) % 23, ((i * 7) % 23) * 2 + (i * 13) % 31)
             for i in range(150)]
    got = _run_rho(spark, pairs)
    exp = py_spearman(pairs)
    assert got == exp
    # two-stage trunc is within 2 ppm of the exact Fraction rho^2
    exact = (
        Fraction(exp["num"] * exp["num"], exp["den2x"] * exp["den2y"])
        * 1_000_000
    )
    assert 0 <= exact - got["rho2_ppm"] < 2


def test_spearman_monotone_transform_is_one(spark):
    """y = 3x + 5 preserves tie groups -> identical double-ranks ->
    rho^2 exactly 1e6 with sign +1; y = -x flips the sign only."""
    xs = [(i * 11) % 17 for i in range(120)]
    up = _run_rho(spark, [(x, 3 * x + 5) for x in xs])
    assert (up["rho2_ppm"], up["rho_sign"]) == (1_000_000, 1)
    assert up["num"] == up["den2x"] == up["den2y"]
    down = _run_rho(spark, [(x, -x) for x in xs])
    assert (down["rho2_ppm"], down["rho_sign"]) == (1_000_000, -1)


def test_spearman_constant_column_is_null(spark):
    got = _run_rho(spark, [(i, 7) for i in range(50)])
    assert got["den2y"] == 0
    assert got["rho2_ppm"] is None and got["rho_sign"] == 0


# ------------------------------------------------------------------ nmi


def py_nmi(pairs):
    cells = Counter(pairs)
    am = Counter(a for a, _ in pairs)
    bm = Counter(b for _, b in pairs)
    n = len(pairs)
    mi = sum(
        nij * rnd(math.log(nij * n / (am[a] * bm[b])) * 1_000_000)
        for (a, b), nij in cells.items()
    )
    ha = sum(ai * rnd(math.log(n / ai) * 1_000_000) for ai in am.values())
    hb = sum(bj * rnd(math.log(n / bj) * 1_000_000) for bj in bm.values())
    if ha + hb == 0:
        out = None
    else:
        mag = abs(2 * mi * 1_000_000) // (ha + hb)
        out = -mag if mi < 0 else mag
    return {
        "n": n,
        "n_cells": len(cells),
        "mi_num": mi,
        "ha_num": ha,
        "hb_num": hb,
        "nmi_ppm": out,
    }


def _run_nmi(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    return nmi(df).collect()[0].asDict()


def test_nmi_matches_lnppm_replay(spark):
    pairs = [((i * 3) % 6, ((i * 3) % 6 + i // 40) % 4) for i in range(200)]
    assert _run_nmi(spark, pairs) == py_nmi(pairs)


def test_nmi_identical_clusterings_is_exactly_one(spark):
    """Diagonal cells make each mi cell ratio THE marginal ratio, so
    mi_num == ha_num == hb_num exactly and nmi_ppm == 1e6 — integer
    identity, no float luck."""
    pairs = [((i * 5) % 7, (i * 5) % 7) for i in range(140)]
    got = _run_nmi(spark, pairs)
    assert got["mi_num"] == got["ha_num"] == got["hb_num"] > 0
    assert got["nmi_ppm"] == 1_000_000


def test_nmi_independence_grid_is_zero(spark):
    """nij = ai*bj/n exactly on a product grid -> every cell ln is 0."""
    pairs = [(a, b) for a in range(3) for b in range(4) for _ in range(5)]
    got = _run_nmi(spark, pairs)
    assert got["mi_num"] == 0 and got["nmi_ppm"] == 0


def test_nmi_label_permutation_invariant(spark):
    pairs = [((i * 3) % 5, (i * 7) % 4) for i in range(160)]
    base = _run_nmi(spark, pairs)
    perm = _run_nmi(spark, [(a, (b + 2) % 4) for a, b in pairs])
    assert base == perm


def test_nmi_both_constant_is_null(spark):
    got = _run_nmi(spark, [(1, 2)] * 30)
    assert got["ha_num"] == got["hb_num"] == 0
    assert got["nmi_ppm"] is None
