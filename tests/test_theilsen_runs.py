"""Gates for Theil-Sen (etl/trend.py theil_sen) and the
Wald-Wolfowitz runs test (etl/runs.py): Theil-Sen against a bit-exact
quantized-median replay, the exact-line closed form (slope recovered
exactly with zero spread), robustness (planted outliers move OLS but
not the median slope), and the even-count lower-median pin; runs
against an exact integer replay AND a float z^2 cross-check, the
perfect-alternation and single-block closed-form run counts, the
clumped-significant vs random-not fixture pair, and the degenerate
NULL contracts."""

from __future__ import annotations

from spanluke_spark.etl.runs import runs_test
from spanluke_spark.etl.trend import theil_sen

# -------------------------------------------------------------- theilsen


def tz(a, b):
    return -(abs(a) // b) if a < 0 else a // b


def py_theil_sen(pts):
    slopes = sorted(
        (tz((yj - yi) * 1_000_000, tj - ti), ti, tj)
        for i, (ti, yi) in enumerate(pts)
        for tj, yj in pts[i + 1:]
        if ti != tj
    )
    m = len(slopes)
    med = slopes[(m + 1) // 2 - 1][0]
    return {
        "n": len(pts),
        "n_pairs": m,
        "slope_ppm": med,
        "lo_ppm": min(s for s, _, _ in slopes),
        "hi_ppm": max(s for s, _, _ in slopes),
    }


def _run_ts(spark, pts):
    df = spark.createDataFrame(pts, "t long, y long")
    return theil_sen(df).collect()[0].asDict()


def test_ts_matches_replay(spark):
    pts = [(i, i * 3 + (i * 13) % 9 + (500 if i % 17 == 0 else 0))
           for i in range(120)]
    assert _run_ts(spark, pts) == py_theil_sen(pts)


def test_ts_exact_line_and_outlier_robustness(spark):
    line = [(i, 7 * i - 4) for i in range(40)]
    got = _run_ts(spark, line)
    assert got["slope_ppm"] == got["lo_ppm"] == got["hi_ppm"] == 7_000_000
    # corrupt 3 points by +10000: the median slope must stay 7.0
    dirty = [(t, y + (10_000 if t in (5, 20, 35) else 0)) for t, y in line]
    assert _run_ts(spark, dirty)["slope_ppm"] == 7_000_000


def test_ts_even_count_lower_median_pin(spark):
    # 4 points -> 6 pairs (even): the (m+1) div 2 = 3rd slope
    pts = [(0, 0), (1, 10), (2, 14), (3, 30)]
    got = _run_ts(spark, pts)
    assert got == py_theil_sen(pts)
    assert got["n_pairs"] == 6


# ------------------------------------------------------------------ runs


def py_runs(xs, crit_milli=3841):
    n = len(xs)
    n1 = sum(xs)
    n2 = n - n1
    r = 1 + sum(1 for a, b in zip(xs, xs[1:]) if a != b) if n else 0
    den = 2 * n1 * n2 * (2 * n1 * n2 - n)
    if den <= 0:
        z2 = d = sig = None
    else:
        dev = r * n - n - 2 * n1 * n2
        z2 = dev * dev * (n - 1) * 1000 // den
        d = (
            "clumping"
            if dev < 0
            else "alternating" if dev > 0 else "exact_expectation"
        )
        sig = z2 >= crit_milli
    return {
        "n": n,
        "n1": n1,
        "n2": n2,
        "r": r,
        "z2_milli": z2,
        "direction": d,
        "sig": sig,
    }


def float_z2(xs):
    n, n1 = len(xs), sum(xs)
    n2 = n - n1
    r = 1 + sum(1 for a, b in zip(xs, xs[1:]) if a != b)
    e = 1 + 2 * n1 * n2 / n
    v = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    return (r - e) ** 2 / v


def _run_runs(spark, xs):
    df = spark.createDataFrame(
        [(i, bool(x)) for i, x in enumerate(xs)], "pos long, x boolean"
    )
    return runs_test(df).collect()[0].asDict()


def test_runs_matches_replay_and_float(spark):
    xs = [1 if ((i // 12) + (1 if (i * 7) % 50 == 0 else 0)) % 2 == 0
          else 0 for i in range(600)]
    got = _run_runs(spark, xs)
    assert got == py_runs(xs)
    assert abs(got["z2_milli"] / 1000 - float_z2(xs)) < 0.01


def test_runs_closed_forms(spark):
    alt = [i % 2 for i in range(40)]
    got = _run_runs(spark, alt)
    assert got["r"] == 40 and got["direction"] == "alternating"
    assert got["sig"] is True
    block = [1] * 20 + [0] * 20
    got = _run_runs(spark, block)
    assert got["r"] == 2 and got["direction"] == "clumping"
    assert got["sig"] is True


def test_runs_random_not_significant(spark):
    import hashlib

    xs = [
        int(hashlib.md5(f"r{i}".encode()).hexdigest(), 16) % 2
        for i in range(400)
    ]
    got = _run_runs(spark, xs)
    assert got == py_runs(xs)
    assert got["sig"] is False


def test_runs_degenerate_null(spark):
    assert _run_runs(spark, [1] * 10)["z2_milli"] is None
    got = _run_runs(spark, [1, 0])  # 2*n1*n2 - n = 0
    assert got["z2_milli"] is None and got["direction"] is None
    assert got["sig"] is None
