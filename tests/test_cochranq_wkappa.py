"""Gates for Cochran's Q (evaluation/cochranq.py) and weighted
Cohen's kappa (evaluation/agreement.py weighted_kappa): Q against an
exact integer replay AND a float cross-check, the k=2 == McNemar
uncorrected (b-c)^2/(b+c) cross-lane identity, the all-agree NULL
denominator, the incomplete-block drop contract, planted-effect
significance vs a permutation null; weighted kappa against a
Fraction replay, perfect-agreement exact 1e6, exact-independence-grid
0, the quadratic-vs-linear weight ordering on off-by-one noise, and
the both-constant NULL contract."""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction

from spanluke_spark.evaluation.agreement import weighted_kappa
from spanluke_spark.evaluation.cochranq import cochran_q

# ------------------------------------------------------------ cochran q


def py_q(rows, k, crit_milli):
    """rows: [(item, trt, x)]."""
    blocks = defaultdict(dict)
    for i, t, x in rows:
        blocks[i][t] = x
    kept = {i: g for i, g in blocks.items() if len(g) == k}
    n_dropped = len(blocks) - len(kept)
    ri = {i: sum(g.values()) for i, g in kept.items()}
    cj = defaultdict(int)
    for g in kept.values():
        for t, x in g.items():
            cj[t] += x
    n = sum(ri.values())
    num = (k - 1) * sum((k * c - n) ** 2 for c in cj.values())
    den = k * (k * n - sum(r * r for r in ri.values()))
    q = num * 1000 // den if den > 0 else None
    return {
        "n_items": len(kept),
        "k": k,
        "n_dropped": n_dropped,
        "n_succ": n,
        "num": num,
        "den": den,
        "q_milli": q,
        "sig": None if q is None else q >= crit_milli,
    }


def _run_q(spark, rows, k, crit_milli=9488):
    df = spark.createDataFrame(rows, "item long, trt long, x long")
    return cochran_q(df, k=k, crit_milli=crit_milli).collect()[0].asDict()


def test_q_matches_replay_and_float(spark):
    rows = [
        (i, t, 1 if (i * 7 + t * t * 3) % 10 < 4 + t else 0)
        for i in range(60)
        for t in range(5)
    ] + [(60, 0, 1), (60, 1, 0)]
    got = _run_q(spark, rows, 5)
    exp = py_q(rows, 5, 9488)
    assert got == exp and got["n_dropped"] == 1
    assert abs(got["q_milli"] / 1000 - exp["num"] / exp["den"]) < 0.001


def test_q_k2_is_uncorrected_mcnemar(spark):
    """b = 7 items (1,0), c = 3 items (0,1), plus concordant rows:
    Q = (b-c)^2/(b+c) = 16/10 = 1.6 exactly."""
    rows = []
    iid = 0
    for _ in range(7):
        rows += [(iid, 0, 1), (iid, 1, 0)]
        iid += 1
    for _ in range(3):
        rows += [(iid, 0, 0), (iid, 1, 1)]
        iid += 1
    for _ in range(5):
        rows += [(iid, 0, 1), (iid, 1, 1)]
        iid += 1
    got = _run_q(spark, rows, 2, crit_milli=3841)
    assert got["q_milli"] == 1600
    assert got["sig"] is False


def test_q_all_agree_is_null(spark):
    rows = [(i, t, i % 2) for i in range(20) for t in range(3)]
    got = _run_q(spark, rows, 3, crit_milli=5991)
    assert got["den"] == 0
    assert got["q_milli"] is None and got["sig"] is None


def test_q_planted_effect_significant_null_not(spark):
    strong = [
        (i, t, 1 if t >= 3 or i % 10 == t else 0)
        for i in range(80)
        for t in range(5)
    ]
    assert _run_q(spark, strong, 5)["sig"] is True
    null = [
        (i, t, 1 if (i * 13 + t * 17 + i * t) % 10 < 5 else 0)
        for i in range(80)
        for t in range(5)
    ]
    assert _run_q(spark, null, 5)["sig"] is False


# -------------------------------------------------------- weighted kappa


def py_wk(pairs, quadratic=True):
    cells = defaultdict(int)
    for la, lb in pairs:
        cells[(la, lb)] += 1
    ai, bj = defaultdict(int), defaultdict(int)
    for (la, lb), c in cells.items():
        ai[la] += c
        bj[lb] += c
    n = len(pairs)

    def w(i, j):
        return (i - j) ** 2 if quadratic else abs(i - j)

    num = n * sum(w(la, lb) * c for (la, lb), c in cells.items())
    den = sum(w(i, j) * a * b for i, a in ai.items() for j, b in bj.items())
    if den == 0:
        kp = None
    else:
        mag = abs(den - num) * 1_000_000 // den
        kp = -mag if den - num < 0 else mag
    return {"n_items": n, "num": num, "den": den, "kappa_ppm": kp}


def _run_wk(spark, pairs, quadratic=True):
    a = spark.createDataFrame(
        [(i, la) for i, (la, _) in enumerate(pairs)], "k long, label long"
    )
    b = spark.createDataFrame(
        [(i, lb) for i, (_, lb) in enumerate(pairs)], "k long, label long"
    )
    return (
        weighted_kappa(a, b, key_cols=["k"], quadratic=quadratic)
        .collect()[0]
        .asDict()
    )


def test_wk_matches_fraction_replay(spark):
    pairs = [
        ((i * 3) % 5, ((i * 3) % 5 + (1 if i % 7 == 0 else 0)) % 5)
        for i in range(300)
    ]
    got = _run_wk(spark, pairs)
    exp = py_wk(pairs)
    assert got == exp
    exact = 1 - Fraction(exp["num"], exp["den"])
    assert abs(Fraction(got["kappa_ppm"], 10**6) - exact) < Fraction(1, 10**6)


def test_wk_perfect_and_independent(spark):
    perfect = [((i * 7) % 4, (i * 7) % 4) for i in range(100)]
    assert _run_wk(spark, perfect)["kappa_ppm"] == 1_000_000
    # exact product grid: O_ij = ai*bj/n -> kappa exactly 0
    grid = [(i, j) for i in range(3) for j in range(4) for _ in range(5)]
    assert _run_wk(spark, grid)["kappa_ppm"] == 0


def test_wk_quadratic_forgives_near_misses_more(spark):
    """All disagreements off-by-one on a 5-level scale: quadratic
    weights penalize them LESS than linear relative to the chance
    denominator -> QWK > LWK."""
    pairs = [
        ((i * 3) % 5, ((i * 3) % 5 + (1 if i % 4 == 0 else 0)) % 5)
        for i in range(400)
        if not ((i * 3) % 5 == 4 and i % 4 == 0)  # keep misses adjacent
    ]
    qwk = _run_wk(spark, pairs, quadratic=True)["kappa_ppm"]
    lwk = _run_wk(spark, pairs, quadratic=False)["kappa_ppm"]
    assert qwk == py_wk(pairs, True)["kappa_ppm"]
    assert lwk == py_wk(pairs, False)["kappa_ppm"]
    assert qwk > lwk


def test_wk_both_constant_is_null(spark):
    pairs = [(2, 2)] * 40
    got = _run_wk(spark, pairs)
    assert got["den"] == 0 and got["kappa_ppm"] is None
