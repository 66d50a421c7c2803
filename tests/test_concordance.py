"""Gates for MCC + Fowlkes-Mallows and Lin's CCC (evaluation/
concordance.py): MCC against a bit-exact signed-square replay AND a
float cross-check, truth/pred swap symmetry, perfect/inverted/
independent classifiers, zero-marginal NULL; CCC against replay, the
y==x exact-1e6 lane, the y==x+c closed form 2Dx/(2Dx+n^2*c^2),
negation -> negative, constant-input NULL, and |CCC| <= |r| (Lin
1989) in floats."""

from __future__ import annotations

from spanluke_spark.evaluation.concordance import lin_ccc, mcc_fm

# ---------------------------------------------------- python replays


def py_mcc_fm(rows):
    tp = sum(1 for t, p in rows if t and p)
    fp = sum(1 for t, p in rows if not t and p)
    fn = sum(1 for t, p in rows if t and not p)
    tn = sum(1 for t, p in rows if not t and not p)
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    num = tp * tn - fp * fn
    mcc2 = (
        None if den == 0
        else (num * num * 10**6 // den) * (1 if num >= 0 else -1)
    )
    fm_den = (tp + fp) * (tp + fn)
    fm2 = None if fm_den == 0 else tp * tp * 10**6 // fm_den
    return {
        "tp": tp, "fp": fp, "fn": fn, "tn": tn,
        "mcc2_ppm": mcc2, "fm2_ppm": fm2,
    }


def py_ccc(pairs):
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    num = 2 * (n * sxy - sx * sy)
    den = (n * sxx - sx * sx) + (n * syy - sy * sy) + (sx - sy) ** 2
    ccc = (
        None if den <= 0
        else (abs(num) * 10**6 // den) * (1 if num >= 0 else -1)
    )
    return {"n": n, "num": num, "den": den, "ccc_ppm": ccc}


def _run_mcc(spark, rows):
    df = spark.createDataFrame(rows, "truth boolean, pred boolean")
    return mcc_fm(df).collect()[0].asDict()


def _run_ccc(spark, pairs):
    df = spark.createDataFrame(pairs, "x long, y long")
    return lin_ccc(df).collect()[0].asDict()


# --------------------------------------------------------------- mcc


def test_mcc_matches_replay_and_float(spark):
    rows = [
        ((e * 13) % 100 < 40,
         (e * 13) % 100 + 7 * (e % 5) - 3 * (e % 3) < 45)
        for e in range(400)
    ]
    got = _run_mcc(spark, rows)
    exp = py_mcc_fm(rows)
    assert got == exp
    tp, fp, fn, tn = exp["tp"], exp["fp"], exp["fn"], exp["tn"]
    mcc = (tp * tn - fp * fn) / (
        (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    ) ** 0.5
    assert got["mcc2_ppm"] == int(mcc * mcc * 10**6)
    fm = tp / ((tp + fp) * (tp + fn)) ** 0.5
    assert got["fm2_ppm"] == int(fm * fm * 10**6)


def test_mcc_swap_symmetry(spark):
    """MCC is symmetric in truth/pred (FP and FN trade places; num
    and den are invariant)."""
    rows = [
        ((e * 13) % 100 < 40, (e * 7) % 100 < 55) for e in range(300)
    ]
    a = _run_mcc(spark, rows)
    b = _run_mcc(spark, [(p, t) for t, p in rows])
    assert a["mcc2_ppm"] == b["mcc2_ppm"]
    assert a["fp"] == b["fn"] and a["fn"] == b["fp"]


def test_mcc_perfect_and_inverted(spark):
    rows = [(e % 3 == 0, e % 3 == 0) for e in range(60)]
    got = _run_mcc(spark, rows)
    assert got["mcc2_ppm"] == 10**6 and got["fm2_ppm"] == 10**6
    inv = _run_mcc(spark, [(t, not t) for t, _ in rows])
    assert inv["mcc2_ppm"] == -(10**6) and inv["fm2_ppm"] == 0


def test_mcc_independent_zero(spark):
    rows = [(e % 2 == 0, (e // 2) % 2 == 0) for e in range(80)]
    got = _run_mcc(spark, rows)
    assert got["mcc2_ppm"] == 0


def test_mcc_zero_marginal_null(spark):
    rows = [(True, e % 2 == 0) for e in range(40)]
    got = _run_mcc(spark, rows)
    assert got["mcc2_ppm"] is None and got["fm2_ppm"] is not None


# --------------------------------------------------------------- ccc


def test_ccc_matches_replay(spark):
    pairs = [((e * 11) % 50, (e * 11) % 50 + (e * 7) % 9 - 4)
             for e in range(200)]
    assert _run_ccc(spark, pairs) == py_ccc(pairs)


def test_ccc_identity_exact_one(spark):
    pairs = [((e * 11) % 50, (e * 11) % 50) for e in range(100)]
    assert _run_ccc(spark, pairs)["ccc_ppm"] == 10**6


def test_ccc_shift_closed_form(spark):
    """y = x + c: CCC == 2*Dx / (2*Dx + n^2*c^2) exactly."""
    c, n = 7, 120
    xs = [(e * 11) % 50 for e in range(n)]
    got = _run_ccc(spark, [(x, x + c) for x in xs])
    sx, sxx = sum(xs), sum(x * x for x in xs)
    dx = n * sxx - sx * sx
    assert got["ccc_ppm"] == 2 * dx * 10**6 // (2 * dx + n * n * c * c)


def test_ccc_negation_negative(spark):
    pairs = [((e * 11) % 50, -((e * 11) % 50)) for e in range(100)]
    assert _run_ccc(spark, pairs)["ccc_ppm"] < 0


def test_ccc_constant_null(spark):
    pairs = [(5, 5) for _ in range(30)]
    assert _run_ccc(spark, pairs)["ccc_ppm"] is None


def test_ccc_bounded_by_pearson(spark):
    """|CCC| <= |r| (Lin 1989): precision cannot exceed correlation."""
    for seed in (3, 7, 13):
        pairs = [((e * 11) % 50, ((e * 11) % 50) * 2 + (e * seed) % 11)
                 for e in range(150)]
        got = _run_ccc(spark, pairs)
        n = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        r = (n * sxy - sx * sy) / (
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        ) ** 0.5
        assert abs(got["ccc_ppm"]) <= abs(r) * 10**6 + 1
