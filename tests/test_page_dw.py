"""Gates for Page's trend test (evaluation/pagetest.py) and
Durbin-Watson (evaluation/dw.py): Page against a bit-exact replay AND
the textbook float chi2_L, the perfect-ordering exact z2 = 80000 lane
(k=5, b=20), order-reversal antisymmetry, the tie/incomplete
drop-and-count contract, b=0 NULL; DW against replay AND float
residual DW, exact intercept/slope shift invariance, the [0, 4000]
bound, tracking noise < 2000 < alternating noise direction, and the
perfect-fit NULL."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.evaluation.dw import durbin_watson
from spanluke_spark.evaluation.pagetest import page_trend

# ---------------------------------------------------- python replays


def py_page(rows, k, crit_milli=3841):
    blocks = defaultdict(dict)
    for b, s, v in rows:
        blocks[b].setdefault(s, []).append(v)
    l2 = 0
    kept = dropped = 0
    for b, d in blocks.items():
        vals = [v for vs in d.values() for v in vs]
        if len(vals) != k or len(set(vals)) != k:
            dropped += 1
            continue
        kept += 1
        order = sorted(vals)
        for s, vs in d.items():
            l2 += s * 2 * (order.index(vs[0]) + 1)
    dev = 2 * l2 - kept * k * (k + 1) ** 2
    den = kept * k * k * (k + 1) * (k * k - 1)
    if den <= 0:
        z2 = direction = sig = None
    else:
        z2 = 9000 * dev * dev // den
        direction = (
            "agrees_with_order" if dev > 0
            else "against_order" if dev < 0 else "exact_expectation"
        )
        sig = z2 >= crit_milli
    return {
        "b_blocks": kept, "n_dropped": dropped, "l2": l2, "dev": dev,
        "z2_milli": z2, "direction": direction, "sig": sig,
    }


def py_dw(series):
    n = len(series)
    sx = sum(x for _, x, _ in series)
    sy = sum(y for _, _, y in series)
    sxx = sum(x * x for _, x, _ in series)
    sxy = sum(x * y for _, x, y in series)
    r = [
        (n * sxx - sx * sx) * y
        - (sxx * sy - sx * sxy)
        - (n * sxy - sx * sy) * x
        for _, x, y in sorted(series)
    ]
    num = sum((a - b) ** 2 for a, b in zip(r[1:], r))
    den = sum(v * v for v in r)
    return {
        "n": n, "num": num, "den": den,
        "d_milli": 1000 * num // den if den > 0 else None,
    }


def _run_page(spark, rows, k):
    df = spark.createDataFrame(rows, "block long, score long, value long")
    return page_trend(df, k=k).collect()[0].asDict()


def _run_dw(spark, series):
    df = spark.createDataFrame(series, "t long, x long, y long")
    return durbin_watson(df).collect()[0].asDict()


PAGE_ROWS = [
    (e // 5, e % 5 + 1, (e * 17) % 50 + 4 * (e % 5)) for e in range(300)
]


# ---------------------------------------------------------------- page


def test_page_matches_replay_and_float(spark):
    got = _run_page(spark, PAGE_ROWS, 5)
    exp = py_page(PAGE_ROWS, 5)
    assert got == exp
    k, b, l = 5, exp["b_blocks"], exp["l2"] / 2
    z2f = (12 * l - 3 * b * k * (k + 1) ** 2) ** 2 / (
        b * k * k * (k + 1) * (k * k - 1)
    )
    assert got["z2_milli"] == int(z2f * 1000)
    assert got["sig"] is True


def test_page_perfect_ordering_exact(spark):
    rows = [(i, j + 1, j) for i in range(20) for j in range(5)]
    got = _run_page(spark, rows, 5)
    assert got["z2_milli"] == 80_000
    assert got["direction"] == "agrees_with_order"


def test_page_reversal_antisymmetry(spark):
    rev = [(b, 6 - s, v) for b, s, v in PAGE_ROWS]
    a, b = _run_page(spark, PAGE_ROWS, 5), _run_page(spark, rev, 5)
    assert a["dev"] == -b["dev"] and a["z2_milli"] == b["z2_milli"]
    assert b["direction"] == "against_order"


def test_page_drop_and_count(spark):
    """A tied block and an incomplete block are both dropped; the
    statistic equals the clean-subset statistic exactly."""
    clean = PAGE_ROWS[:100]
    tied = [(1000, j + 1, 7) for j in range(5)]  # all values equal
    incomplete = [(1001, j + 1, j) for j in range(3)]
    got = _run_page(spark, clean + tied + incomplete, 5)
    base = _run_page(spark, clean, 5)
    assert got["n_dropped"] == 2
    assert got["l2"] == base["l2"] and got["z2_milli"] == base["z2_milli"]


def test_page_all_dropped_null(spark):
    rows = [(i, j + 1, 7) for i in range(4) for j in range(5)]
    got = _run_page(spark, rows, 5)
    assert got["b_blocks"] == 0 and got["z2_milli"] is None


# ------------------------------------------------------------------ dw

SERIES = [(e, e, 2 * e + (e * 7) % 10) for e in range(40)]


def test_dw_matches_replay_and_float(spark):
    got = _run_dw(spark, SERIES)
    assert got == py_dw(SERIES)
    # float residual DW from first principles
    n = len(SERIES)
    xs = [x for _, x, _ in SERIES]
    ys = [y for _, _, y in SERIES]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    r = [y - a - b * x for x, y in zip(xs, ys)]
    d = sum((p - q) ** 2 for p, q in zip(r[1:], r)) / sum(
        v * v for v in r
    )
    assert got["d_milli"] == int(d * 1000)


def test_dw_shift_and_slope_invariance(spark):
    """y -> y + c and y -> y + m*x leave every D-scaled residual, and
    hence d, EXACTLY unchanged."""
    base = _run_dw(spark, SERIES)
    shifted = _run_dw(spark, [(t, x, y + 17) for t, x, y in SERIES])
    sloped = _run_dw(spark, [(t, x, y + 3 * x) for t, x, y in SERIES])
    assert base["num"] == shifted["num"] and base["den"] == shifted["den"]
    assert base["num"] == sloped["num"] and base["den"] == sloped["den"]


def test_dw_bound_and_direction(spark):
    got = _run_dw(spark, SERIES)
    assert 0 <= got["d_milli"] <= 4000
    # slowly-varying (tracking) noise: d < 2000
    track = [(e, e, 2 * e + (e // 8) % 5) for e in range(40)]
    assert _run_dw(spark, track)["d_milli"] < 2000
    # alternating noise: d > 2000
    alt = [(e, e, 2 * e + 5 * (e % 2)) for e in range(40)]
    assert _run_dw(spark, alt)["d_milli"] > 2000


def test_dw_perfect_fit_null(spark):
    series = [(e, e, 3 * e + 7) for e in range(20)]
    got = _run_dw(spark, series)
    assert got["den"] == 0 and got["d_milli"] is None
