"""Gates for Gini split gain and Cramér's V (evaluation/
association.py): gain against a bit-exact replay AND a float CART
cross-check, perfect split gain == parent exactly, replicated-
proportions gain == 0 exactly, constant label both-zero; V against
replay AND float chi-squared, the k x k identity-table exact 1e6,
independence-grid exact 0, transpose invariance, single-category
NULL."""

from __future__ import annotations

from collections import Counter

from spanluke_spark.evaluation.association import (
    cramers_v,
    gini_split_gain,
)

# ---------------------------------------------------- python replays


def py_gain(rows):
    vc = Counter(rows)
    per_v = {}
    for (v, c), m in vc.items():
        nv, s2v = per_v.get(v, (0, 0))
        per_v[v] = (nv + m, s2v + m * m)
    per_c = Counter(c for _, c in rows)
    n = len(rows)
    s2 = sum(m * m for m in per_c.values())
    parent = 10**6 * (n * n - s2) // (n * n)
    child = sum(
        10**6 * (nv * nv - s2v) // (nv * n)
        for nv, s2v in per_v.values()
    )
    return {
        "n": n,
        "n_values": len(per_v),
        "parent_ppm": parent,
        "child_ppm": child,
        "gain_ppm": parent - child,
    }


def py_v(rows):
    obs = Counter(rows)
    rm = Counter(i for i, _ in rows)
    cm = Counter(j for _, j in rows)
    n = len(rows)
    chi2 = sum(
        1000 * (n * obs.get((i, j), 0) - rm[i] * cm[j]) ** 2
        // (n * rm[i] * cm[j])
        for i in rm
        for j in cm
    )
    r, c = len(rm), len(cm)
    v2 = (
        chi2 * 1000 // (n * (min(r, c) - 1)) if min(r, c) >= 2 else None
    )
    return {"n": n, "r": r, "c": c, "chi2_milli": chi2, "v2_ppm": v2}


def _run_gain(spark, rows):
    df = spark.createDataFrame(
        [(str(v), str(c)) for v, c in rows], "feature string, label string"
    )
    return gini_split_gain(df).collect()[0].asDict()


def _run_v(spark, rows):
    df = spark.createDataFrame(
        [(str(i), str(j)) for i, j in rows], "a string, b string"
    )
    return cramers_v(df).collect()[0].asDict()


GAIN_ROWS = [
    ((e * 3) % 5,
     (e * 11) % 3 if e % 4 == 0 else ((e * 3) % 5) % 3)
    for e in range(400)
]
V_ROWS = [
    ((e * 3) % 4, ((e * 3) % 4 + (1 if e % 5 == 0 else 0)) % 4)
    for e in range(320)
]


# ---------------------------------------------------------------- gain


def test_gain_matches_replay_and_float(spark):
    got = _run_gain(spark, [(str(v), str(c)) for v, c in GAIN_ROWS])
    exp = py_gain([(str(v), str(c)) for v, c in GAIN_ROWS])
    assert got == exp
    # float CART gain, cells quantized identically would drift < 5ppm
    per_v = {}
    for v, c in GAIN_ROWS:
        per_v.setdefault(v, []).append(c)
    n = len(GAIN_ROWS)
    cnt = Counter(c for _, c in GAIN_ROWS)
    parent = 1 - sum((m / n) ** 2 for m in cnt.values())
    child = sum(
        (len(cs) / n)
        * (1 - sum((m / len(cs)) ** 2 for m in Counter(cs).values()))
        for cs in per_v.values()
    )
    assert abs(got["gain_ppm"] - (parent - child) * 10**6) <= 5


def test_gain_perfect_split(spark):
    rows = [(e % 4, e % 4) for e in range(160)]
    got = _run_gain(spark, rows)
    assert got["child_ppm"] == 0
    assert got["gain_ppm"] == got["parent_ppm"] == 750_000


def test_gain_replicated_proportions_zero(spark):
    """4 children of size 10, each 50/50 across 2 classes: every
    division is exact and the gain is exactly 0."""
    rows = [(v, e % 2) for v in range(4) for e in range(10)]
    got = _run_gain(spark, rows)
    assert got["parent_ppm"] == 500_000
    assert got["gain_ppm"] == 0


def test_gain_constant_label(spark):
    rows = [(e % 5, "x") for e in range(50)]
    got = _run_gain(spark, rows)
    assert got["parent_ppm"] == 0 and got["gain_ppm"] == 0


# ------------------------------------------------------------------- v


def test_v_matches_replay_and_float(spark):
    got = _run_v(spark, V_ROWS)
    exp = py_v([(str(i), str(j)) for i, j in V_ROWS])
    assert got == exp
    obs = Counter(V_ROWS)
    rm = Counter(i for i, _ in V_ROWS)
    cm = Counter(j for _, j in V_ROWS)
    n = len(V_ROWS)
    chi2 = sum(
        (obs.get((i, j), 0) - rm[i] * cm[j] / n) ** 2
        / (rm[i] * cm[j] / n)
        for i in rm
        for j in cm
    )
    v2 = chi2 / (n * (min(len(rm), len(cm)) - 1))
    assert abs(got["v2_ppm"] - v2 * 10**6) <= 60  # 16 quantized cells


def test_v_identity_table_exact_one(spark):
    rows = [(e % 4, e % 4) for e in range(160)]
    got = _run_v(spark, rows)
    assert got["v2_ppm"] == 10**6
    assert got["chi2_milli"] == 480_000  # N(k-1) in milli


def test_v_independence_exact_zero(spark):
    rows = [(e % 4, (e // 4) % 5) for e in range(160)]
    got = _run_v(spark, rows)
    assert got["chi2_milli"] == 0 and got["v2_ppm"] == 0


def test_v_transpose_invariance(spark):
    a = _run_v(spark, V_ROWS)
    b = _run_v(spark, [(j, i) for i, j in V_ROWS])
    assert a["chi2_milli"] == b["chi2_milli"]
    assert a["v2_ppm"] == b["v2_ppm"]


def test_v_single_category_null(spark):
    rows = [(0, e % 3) for e in range(30)]
    assert _run_v(spark, rows)["v2_ppm"] is None
