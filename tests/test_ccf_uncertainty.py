"""Gates for CCF (etl/ccf.py) and Theil's U (evaluation/
uncertainty.py): CCF against an exact integer replay AND the float
definition, the planted-lead closed form (a shifted copy peaks at
exactly its shift with ccf2 == acf-style self-match), lag-0 ==
Pearson^2 consistency, sign antisymmetry under y -> -y, constant-side
NULL; U against a quantized replay, the y == f(x) EXACT-1e6 lane,
exact-0 independence, constant-target NULL, and the
u_sym-is-harmonic-style bracketing u_sym between min and max of the
directional pair."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from spanluke_spark.etl.ccf import ccf
from spanluke_spark.evaluation.uncertainty import uncertainty_coefficient

# ---------------------------------------------------- python replays


def py_ccf(xs, ys, max_lag):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    cx = [n * v - sx for v in xs]
    cy = [n * v - sy for v in ys]
    den_x = sum(v * v for v in cx)
    den_y = sum(v * v for v in cy)
    out = {}
    for lag in range(-max_lag, max_lag + 1):
        pairs = [
            (cx[t], cy[t + lag])
            for t in range(n)
            if 0 <= t + lag < n
        ]
        if not pairs:
            continue
        num = sum(a * b for a, b in pairs)
        if den_x == 0 or den_y == 0:
            ppm = None
        else:
            mag = num * num * 10**6 // (den_x * den_y)
            ppm = -mag if num < 0 else mag
        out[lag] = {
            "n_pairs": len(pairs),
            "ccf_num": num,
            "den_x": den_x,
            "den_y": den_y,
            "ccf2_ppm": ppm,
        }
    return out


def py_u(rows):
    n = len(rows)
    cells = Counter(rows)
    nx = Counter(a for a, _ in rows)
    ny = Counter(b for _, b in rows)
    q = lambda v: round(math.log(v) * 10**6)
    i_cells = sum(
        c * q(c * n / (nx[a] * ny[b])) for (a, b), c in cells.items()
    )
    i_cells = max(i_cells, 0)
    h_x = sum(c * q(n / c) for c in nx.values())
    h_y = sum(c * q(n / c) for c in ny.values())
    return {
        "n": n,
        "n_cells": len(cells),
        "i_cells": i_cells,
        "h_x": h_x,
        "h_y": h_y,
        "u_yx_ppm": i_cells * 10**6 // h_y if h_y > 0 else None,
        "u_xy_ppm": i_cells * 10**6 // h_x if h_x > 0 else None,
        "u_sym_ppm": (
            2 * i_cells * 10**6 // (h_x + h_y)
            if h_x + h_y > 0
            else None
        ),
    }


def _run_ccf(spark, xs, ys, max_lag=3):
    df = spark.createDataFrame(
        [(0, i, int(a), int(b)) for i, (a, b) in enumerate(zip(xs, ys))],
        "key long, bucket long, x long, y long",
    )
    got = {}
    for r in ccf(df, max_lag=max_lag).collect():
        d = r.asDict()
        lag = d.pop("lag")
        got[lag] = {k: v for k, v in d.items() if k != "key"}
    return got


def _run_u(spark, rows):
    df = spark.createDataFrame(list(rows), "x long, y long")
    return (
        uncertainty_coefficient(df, F.col("x"), F.col("y"))
        .collect()[0]
        .asDict()
    )


XS = [(i * 7) % 13 + (i % 4) for i in range(40)]
YS = [XS[i - 2] + (i % 3) if i >= 2 else (i * 5) % 9 for i in range(40)]


# ----------------------------------------------------------------- ccf


def test_ccf_matches_replay_and_float(spark):
    got = _run_ccf(spark, XS, YS)
    exp = py_ccf(XS, YS, 3)
    assert got == exp
    # float cross-check at the peak lag
    n = len(XS)
    mx, my = sum(XS) / n, sum(YS) / n
    num = sum(
        (XS[t] - mx) * (YS[t + 2] - my) for t in range(n - 2)
    )
    den = math.sqrt(
        sum((v - mx) ** 2 for v in XS) * sum((v - my) ** 2 for v in YS)
    )
    r = num / den
    assert abs(abs(got[2]["ccf2_ppm"]) - r * r * 10**6) <= 2


def test_ccf_planted_lead_peaks_at_shift(spark):
    got = _run_ccf(spark, XS, YS)
    peak = max(got, key=lambda l: abs(got[l]["ccf2_ppm"]))
    assert peak == 2  # y echoes x two buckets later
    assert got[2]["ccf2_ppm"] > 500_000


def test_ccf_sign_antisymmetry(spark):
    pos = _run_ccf(spark, XS, YS)
    neg = _run_ccf(spark, XS, [-v for v in YS])
    for lag in pos:
        assert pos[lag]["ccf2_ppm"] == -neg[lag]["ccf2_ppm"]


def test_ccf_lag0_of_self_is_one(spark):
    got = _run_ccf(spark, XS, XS)
    assert got[0]["ccf2_ppm"] == 10**6


def test_ccf_constant_side_null(spark):
    got = _run_ccf(spark, XS, [7] * len(XS))
    assert all(v["ccf2_ppm"] is None for v in got.values())


# ------------------------------------------------------------ theil U


def test_u_matches_replay(spark):
    rows = [((i * 3) % 6, ((i * 3) % 6 + i % 2) % 4) for i in range(60)]
    assert _run_u(spark, rows) == py_u(rows)


def test_u_function_of_x_exact_one(spark):
    rows = [(i % 6, (i % 6) % 3) for i in range(48)]
    got = _run_u(spark, rows)
    assert got["u_yx_ppm"] == 10**6
    assert got["u_xy_ppm"] < 10**6  # x is NOT a function of y here


def test_u_independence_exact_zero(spark):
    rows = [(a, b) for a in range(4) for b in range(3) for _ in range(2)]
    got = _run_u(spark, rows)
    assert got["i_cells"] == 0
    assert got["u_yx_ppm"] == 0 and got["u_xy_ppm"] == 0


def test_u_constant_target_null(spark):
    got = _run_u(spark, [(i % 5, 2) for i in range(20)])
    assert got["u_yx_ppm"] is None
    assert got["u_xy_ppm"] == 0  # I == 0, H(x) > 0


def test_u_sym_between_directional(spark):
    rows = [((i * 7) % 5, ((i * 7) % 5 + i % 3) % 4) for i in range(60)]
    got = _run_u(spark, rows)
    assert got == py_u(rows)
    lo = min(got["u_yx_ppm"], got["u_xy_ppm"])
    hi = max(got["u_yx_ppm"], got["u_xy_ppm"])
    assert lo - 1 <= got["u_sym_ppm"] <= hi + 1
