"""Gates for evaluation/diagnostic.py: the panel against an integer
replay, the dor == lr+/lr- == q395-odds-ratio identity, the
useless-detector LR == 1 lane, perfect-specificity NULL; turning
points against a replay AND float moments, monotone-fires-below,
alternation-fires-above, scramble-quiet, and the tie audit."""

from __future__ import annotations

from spanluke_spark.evaluation.diagnostic import (
    diagnostic_panel,
    turning_points,
)

# ---------------------------------------------------- python replays


def py_panel(tp, fp, fn, tn):
    out = {"tp": tp, "fp": fp, "fn": fn, "tn": tn}
    out["sens_ppm"] = tp * 10**6 // (tp + fn) if tp + fn else None
    out["spec_ppm"] = tn * 10**6 // (tn + fp) if tn + fp else None
    out["lr_plus_milli"] = (
        tp * (tn + fp) * 1000 // ((tp + fn) * fp)
        if tp + fn and fp
        else None
    )
    out["lr_minus_milli"] = (
        fn * (tn + fp) * 1000 // ((tp + fn) * tn)
        if tp + fn and tn
        else None
    )
    out["dor_milli"] = tp * tn * 1000 // (fp * fn) if fp * fn else None
    return out


def py_turning(xs):
    n = len(xs)
    t = sum(
        1
        for i in range(1, n - 1)
        if (xs[i] - xs[i - 1]) * (xs[i] - xs[i + 1]) > 0
    )
    ties = sum(1 for i in range(1, n) if xs[i] == xs[i - 1])
    out = {"n": n, "n_turning": t, "n_adjacent_ties": ties}
    if n >= 3 and ties == 0:
        z2 = 10000 * (3 * t - 2 * (n - 2)) ** 2 // (16 * n - 29)
        out["z2_milli"] = z2
        out["sig05"] = z2 > 3841
        out["status"] = "ok"
    else:
        out["z2_milli"] = None
        out["sig05"] = None
        out["status"] = "too_small" if n < 3 else "ties"
    return out


def _run_panel(spark, tp, fp, fn, tn):
    rows = (
        [(True, True)] * tp
        + [(False, True)] * fp
        + [(True, False)] * fn
        + [(False, False)] * tn
    )
    df = spark.createDataFrame(rows, "truth boolean, pred boolean")
    return diagnostic_panel(df).collect()[0].asDict()


def _run_tp(spark, xs):
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(xs)], "t long, x long"
    )
    return turning_points(df).collect()[0].asDict()


def test_panel_matches_replay_and_dor_identity(spark):
    got = _run_panel(spark, 40, 10, 8, 60)
    assert got == py_panel(40, 10, 8, 60)
    # DOR == LR+/LR- on the exact rationals (the truncated milli
    # values carry ~1/lr_minus relative slack, so compare untruncated)
    tp, fp, fn, tn = 40, 10, 8, 60
    lrp = (tp / (tp + fn)) / (fp / (tn + fp))
    lrm = (fn / (tp + fn)) / (tn / (tn + fp))
    assert abs(got["dor_milli"] / 1000 - lrp / lrm) < 1e-9
    from spanluke_spark.evaluation.twobytwo import two_by_two_effects

    rows = (
        [(True, True)] * 40
        + [(True, False)] * 10
        + [(False, True)] * 8
        + [(False, False)] * 60
    )
    df = spark.createDataFrame(rows, "exposed boolean, positive boolean")
    or_ppm = two_by_two_effects(df).collect()[0]["or_ppm"]
    assert abs(got["dor_milli"] * 1000 - or_ppm) <= 1000


def test_panel_useless_detector(spark):
    # pred independent of truth with equal rates: LR+ == LR- == 1
    got = _run_panel(spark, 20, 20, 20, 20)
    assert got["lr_plus_milli"] == 1000
    assert got["lr_minus_milli"] == 1000
    assert got["dor_milli"] == 1000


def test_panel_perfect_spec_null(spark):
    got = _run_panel(spark, 30, 0, 5, 50)
    assert got["lr_plus_milli"] is None  # infinite
    assert got["dor_milli"] is None
    assert got["spec_ppm"] == 10**6


def test_turning_matches_replay_and_float(spark):
    xs = [(i * i * 31 + i * 17) % 23 + i % 2 * 24 for i in range(40)]
    # de-tie: ensure no adjacent equal values
    xs = [v * 2 + (i % 2) for i, v in enumerate(xs)]
    got = _run_tp(spark, xs)
    assert got == py_turning(xs)
    n, t = got["n"], got["n_turning"]
    z2 = (t - 2 * (n - 2) / 3) ** 2 / ((16 * n - 29) / 90)
    assert abs(got["z2_milli"] - z2 * 1000) <= 15


def test_turning_direction_lanes(spark):
    up = _run_tp(spark, list(range(30)))
    assert up["n_turning"] == 0 and up["sig05"] is True
    alt = _run_tp(spark, [i % 2 * 10 + i // 2 for i in range(30)])
    assert alt == py_turning([i % 2 * 10 + i // 2 for i in range(30)])
    assert alt["sig05"] is True
    quiet = [(i * i * 31 + i * 17) % 23 for i in range(40)]
    quiet = [v * 3 + (i % 3) for i, v in enumerate(quiet)]
    got = _run_tp(spark, quiet)
    assert got == py_turning(quiet)


def test_turning_tie_audit(spark):
    got = _run_tp(spark, [1, 2, 2, 3, 1])
    assert got["status"] == "ties" and got["z2_milli"] is None
