"""Gates for evaluation/meta.py and evaluation/simpson.py: meta
pooling against an exact integer replay AND float formulas, the
identical-effects exact-zero lane (Q == I2 == tau2 == 0), planted
two-cluster heterogeneity driving I2 high, weight-scale invariance
of pooled/I2 (and the documented NON-invariance of Q), k == 1
NULLs; Simpson audit against replay, the kidney-stone textbook
paradox, a unanimous no-paradox family, and the zero-cell-stratum
direction-0 census."""

from __future__ import annotations

from spanluke_spark.evaluation.meta import meta_fixed
from spanluke_spark.evaluation.simpson import simpsons_audit

# ---------------------------------------------------- python replays


def py_meta(pairs):
    k = len(pairs)
    W = sum(w for _, w in pairs)
    W2 = sum(w * w for _, w in pairs)
    WY = sum(w * y for y, w in pairs)
    WYY = sum(w * y * y for y, w in pairs)
    qn = W * WYY - WY * WY
    out = {"k": k, "w_sum": W}
    pm = abs(WY) * 1000 // W if W > 0 else None
    out["pooled_milli"] = (-pm if WY < 0 else pm) if W > 0 else None
    out["q_milli"] = qn * 1000 // W if k >= 2 and W > 0 else None
    excess = max(qn - (k - 1) * W, 0)
    if k >= 2 and qn > 0:
        out["i2_ppm"] = excess * 10**6 // qn
    elif k >= 2 and qn == 0:
        out["i2_ppm"] = 0
    else:
        out["i2_ppm"] = None
    cden = W * W - W2
    out["tau2_milli"] = (
        excess * 1000 // cden if k >= 2 and cden > 0 else None
    )
    return out


def _run_meta(spark, pairs):
    df = spark.createDataFrame(list(pairs), "y long, w long")
    return meta_fixed(df).collect()[0].asDict()


def _run_simpson(spark, tables):
    rows = []
    for s, (a, b, c, d) in tables.items():
        rows += (
            [(s, True, True)] * a
            + [(s, True, False)] * b
            + [(s, False, True)] * c
            + [(s, False, False)] * d
        )
    df = spark.createDataFrame(
        rows, "stratum string, exposed boolean, positive boolean"
    )
    return simpsons_audit(df).collect()[0].asDict()


PAIRS = [(12, 5), (15, 3), (11, 8), (30, 2), (14, 6)]


def test_meta_matches_replay_and_float(spark):
    got = _run_meta(spark, PAIRS)
    assert got == py_meta(PAIRS)
    W = sum(w for _, w in PAIRS)
    ybar = sum(w * y for y, w in PAIRS) / W
    q = sum(w * (y - ybar) ** 2 for y, w in PAIRS)
    assert abs(got["q_milli"] - q * 1000) <= 1
    i2 = max(q - (len(PAIRS) - 1), 0) / q
    assert abs(got["i2_ppm"] - i2 * 10**6) <= 2


def test_meta_identical_effects_exact_zero(spark):
    got = _run_meta(spark, [(20, w) for w in (1, 5, 9, 2)])
    assert got["q_milli"] == 0
    assert got["i2_ppm"] == 0
    assert got["tau2_milli"] == 0
    assert got["pooled_milli"] == 20_000


def test_meta_two_cluster_heterogeneity(spark):
    got = _run_meta(spark, [(0, 5)] * 4 + [(100, 5)] * 4)
    assert got == py_meta([(0, 5)] * 4 + [(100, 5)] * 4)
    assert got["i2_ppm"] > 900_000


def test_meta_weight_scale_sensitivity(spark):
    # only the pooled mean is weight-scale-free; Q scales linearly
    # and I2 shifts through the absolute df term (documented)
    a = _run_meta(spark, PAIRS)
    b = _run_meta(spark, [(y, 10 * w) for y, w in PAIRS])
    assert a == py_meta(PAIRS)
    assert b == py_meta([(y, 10 * w) for y, w in PAIRS])
    assert a["pooled_milli"] == b["pooled_milli"]
    # 10x up to the coarser truncation of the unscaled run
    assert 0 <= b["q_milli"] - 10 * a["q_milli"] < 10
    assert b["i2_ppm"] > a["i2_ppm"]


def test_meta_single_study_nulls(spark):
    got = _run_meta(spark, [(42, 7)])
    assert got["pooled_milli"] == 42_000
    assert got["q_milli"] is None and got["i2_ppm"] is None
    assert got["tau2_milli"] is None


# ------------------------------------------------------------ simpson


KIDNEY = {
    "small": (81, 6, 234, 36),
    "large": (192, 71, 55, 25),
}


def test_simpson_kidney_stone_paradox(spark):
    got = _run_simpson(spark, KIDNEY)
    assert got["n_pos"] == 2 and got["n_neg"] == 0
    assert got["agg_num"] < 0
    assert got["agg_direction"] == "exposed_worse"
    assert got["reversal_strata"] == 2
    assert got["paradox"] is True


def test_simpson_unanimous_no_paradox(spark):
    tables = {
        "s1": (30, 10, 20, 20),
        "s2": (60, 20, 40, 40),  # same split scaled: pooling is safe
    }
    got = _run_simpson(spark, tables)
    assert got["n_pos"] == 2
    assert got["agg_direction"] == "exposed_better"
    assert got["reversal_strata"] == 0
    assert got["paradox"] is False


def test_simpson_zero_direction_census(spark):
    tables = {
        "null": (10, 10, 5, 5),  # ad == bc
        "pos": (20, 5, 5, 20),
    }
    got = _run_simpson(spark, tables)
    assert got["n_zero"] == 1 and got["n_pos"] == 1
    assert got["paradox"] is False
