"""Gates for evaluation/edf2.py: both tests against exact replays
AND the definitional float statistics, shifted-samples-fire /
interleaved-quiet, AD's tail sensitivity beating CvM on a
tail-only difference, the no-ties audit, and single-element
groups staying defined."""

from __future__ import annotations

from spanluke_spark.evaluation.edf2 import (
    anderson_darling_2s,
    cramer_von_mises_2s,
)

# ---------------------------------------------------- python replays


def _frame(rows):
    vals = sorted((x, g) for g, x in rows)
    nn = len(vals)
    n = sum(1 for g, _ in rows if g == 0)
    mj = 0
    out = []
    for j, (x, g) in enumerate(vals, start=1):
        if g == 0:
            mj += 1
        out.append((j, mj))
    return nn, n, out


def py_cvm(rows):
    nn, n, frame = _frame(rows)
    m = nn - n
    dx = len({x for _, x in rows})
    ssq = sum((mj * nn - j * n) ** 2 for j, mj in frame)
    if dx < nn:
        return {"n": n, "m": m, "t_milli": None, "sig05": None,
                "status": "ties"}
    t = 1000 * ssq // (n * m * nn * nn)
    return {"n": n, "m": m, "t_milli": t, "sig05": t > 461,
            "status": "ok"}


def py_ad(rows):
    nn, n, frame = _frame(rows)
    m = nn - n
    dx = len({x for _, x in rows})
    cs = sum(
        10**6 * (mj * nn - j * n) ** 2 // (j * (nn - j))
        for j, mj in frame
        if j < nn
    )
    out = {"n": n, "m": m, "cell_sum": cs}
    if dx < nn:
        return {**out, "a2_milli": None, "sig05": None,
                "status": "ties"}
    a2 = cs // (1000 * n * m)
    return {**out, "a2_milli": a2, "sig05": a2 > 2492, "status": "ok"}


def _run(spark, rows, fn):
    df = spark.createDataFrame(list(rows), "grp long, x long")
    return fn(df).collect()[0].asDict()


SHIFT = [(0, 10 * i + 7) for i in range(20)] + [
    (1, 10 * (i + 10) + 2) for i in range(20)
]
INTER = [(i % 2, 10 * i + i % 2) for i in range(40)]


def test_both_match_replay_and_float(spark):
    for rows in (SHIFT, INTER):
        got_c = _run(spark, rows, cramer_von_mises_2s)
        got_a = _run(spark, rows, anderson_darling_2s)
        assert got_c == py_cvm(rows)
        assert got_a == py_ad(rows)
    nn, n, frame = _frame(SHIFT)
    m = nn - n
    t_f = sum((mj / n - (j - mj) / m) ** 2 for j, mj in frame) * (
        n * m / nn**2
    )
    a_f = (
        sum(
            (mj * nn - j * n) ** 2 / (j * (nn - j))
            for j, mj in frame
            if j < nn
        )
        / (n * m)
    )
    got_c = _run(spark, SHIFT, cramer_von_mises_2s)
    got_a = _run(spark, SHIFT, anderson_darling_2s)
    assert abs(got_c["t_milli"] - t_f * 1000) <= 1
    assert abs(got_a["a2_milli"] - a_f * 1000) <= 1


def test_shift_fires_interleaved_quiet(spark):
    assert _run(spark, SHIFT, cramer_von_mises_2s)["sig05"] is True
    assert _run(spark, SHIFT, anderson_darling_2s)["sig05"] is True
    assert _run(spark, INTER, cramer_von_mises_2s)["sig05"] is False
    assert _run(spark, INTER, anderson_darling_2s)["sig05"] is False


def test_ad_tail_sensitivity(spark):
    # identical interleaved bodies, group 0 owns both extreme tails
    body = [(i % 2, 100 + 10 * i + i % 2) for i in range(30)]
    tails = [(0, 1), (0, 3), (0, 5), (0, 2000), (0, 2001), (0, 2002)]
    rows = body + tails
    a = _run(spark, rows, anderson_darling_2s)
    c = _run(spark, rows, cramer_von_mises_2s)
    assert a == py_ad(rows) and c == py_cvm(rows)
    # AD's relative exceedance of its critical point beats CvM's
    assert a["a2_milli"] * 461 > c["t_milli"] * 2492


def test_tie_audit_and_small_groups(spark):
    tied = [(0, 5), (1, 5), (0, 7), (1, 9)]
    got = _run(spark, tied, cramer_von_mises_2s)
    assert got["status"] == "ties" and got["t_milli"] is None
    tiny = [(0, 3), (1, 8), (1, 12), (1, 20)]
    got2 = _run(spark, tiny, anderson_darling_2s)
    assert got2 == py_ad(tiny)
    assert got2["a2_milli"] is not None
