"""Gates for evaluation/chow.py and evaluation/twobytwo.py: Chow
against an exact Fraction replay (moments -> RSS rationals -> cleared
F), the planted-break-fires / same-line-stays-quiet pair, the
two-exact-lines perfect_fit lane, degenerate guards (tiny segment,
constant x), and segment-relabel symmetry; the 2x2 panel against an
integer replay, the independence exact-identity lane
(OR == RR == 1e6, Q == RD == 0), row-swap inversion/negation, and
zero-cell NULL gates."""

from __future__ import annotations

from fractions import Fraction

from spanluke_spark.evaluation.chow import chow_test
from spanluke_spark.evaluation.twobytwo import two_by_two_effects

# ---------------------------------------------------- python replays


def py_chow(rows):
    def moments(sub):
        n = len(sub)
        sx = sum(x for x, _ in sub)
        sy = sum(y for _, y in sub)
        sxx = sum(x * x for x, _ in sub)
        sxy = sum(x * y for x, y in sub)
        syy = sum(y * y for _, y in sub)
        a = n * sxx - sx * sx
        b = n * syy - sy * sy
        c = n * sxy - sx * sy
        return n, a, a * b - c * c, n * a

    s1 = [(x, y) for s, x, y in rows if s == 1]
    s2 = [(x, y) for s, x, y in rows if s == 2]
    sp = [(x, y) for _, x, y in rows]
    out = {"n1": len(s1) or None, "n2": len(s2) or None}
    if not s1 or not s2:
        return {**out, "rss1_milli": None, "rss2_milli": None,
                "rssp_milli": None, "status": "degenerate",
                "f_milli": None}
    n1, a1, qn, qd = moments(s1)
    n2, a2, rn, rd = moments(s2)
    np_, ap, pn, pd = moments(sp)
    out["rss1_milli"] = 1000 * qn // qd if qd > 0 else None
    out["rss2_milli"] = 1000 * rn // rd if rd > 0 else None
    out["rssp_milli"] = 1000 * pn // pd if pd > 0 else None
    if qd <= 0 or rd <= 0 or pd <= 0:
        return {**out, "status": "degenerate", "f_milli": None}
    if qn == 0 and rn == 0:
        return {**out, "status": "perfect_fit", "f_milli": None}
    f = (
        Fraction(pn, pd) - Fraction(qn, qd) - Fraction(rn, rd)
    ) / 2 / ((Fraction(qn, qd) + Fraction(rn, rd)) / (np_ - 4))
    return {
        **out,
        "status": "ok",
        "f_milli": int(f * 1000) if f >= 0 else -int(-f * 1000) - (
            1 if (-f * 1000) % 1 else 0
        ),
    }


def py_2x2(a, b, c, d):
    def trunc(num, den):
        mag = abs(num) * 10**6 // den
        return -mag if num < 0 else mag

    return {
        "a": a, "b": b, "c": c, "d": d,
        "or_ppm": a * d * 10**6 // (b * c) if b * c > 0 else None,
        "yule_q_ppm": (
            trunc(a * d - b * c, a * d + b * c)
            if a * d + b * c > 0
            else None
        ),
        "rr_ppm": (
            a * (c + d) * 10**6 // (c * (a + b))
            if c > 0 and a + b > 0
            else None
        ),
        "rd_ppm": (
            trunc(a * (c + d) - c * (a + b), (a + b) * (c + d))
            if a + b > 0 and c + d > 0
            else None
        ),
    }


def _run_chow(spark, rows):
    df = spark.createDataFrame(list(rows), "seg long, x long, y long")
    return chow_test(df).collect()[0].asDict()


def _run_2x2(spark, a, b, c, d):
    rows = (
        [(True, True)] * a
        + [(True, False)] * b
        + [(False, True)] * c
        + [(False, False)] * d
    )
    df = spark.createDataFrame(rows, "exposed boolean, positive boolean")
    return two_by_two_effects(df).collect()[0].asDict()


# ---------------------------------------------------------------- chow


BROKEN = [(1, x, 2 * x + 1 + (x % 3)) for x in range(20)] + [
    (2, x, 9 - x + (x % 2)) for x in range(20)
]
SAME = [(1, x, 3 * x - 2 + (x * 7) % 3 - 1) for x in range(20)] + [
    (2, x, 3 * x - 2 + ((x + 1) * 7) % 3 - 1) for x in range(20)
]


def test_chow_matches_replay(spark):
    for rows in (BROKEN, SAME):
        got = _run_chow(spark, rows)
        exp = py_chow(rows)
        assert got["status"] == exp["status"]
        assert got["rss1_milli"] == exp["rss1_milli"]
        assert got["rss2_milli"] == exp["rss2_milli"]
        assert got["rssp_milli"] == exp["rssp_milli"]
        if exp["status"] == "ok":
            # trunc-toward-zero convention on the Spark side
            assert abs(got["f_milli"] - exp["f_milli"]) <= 1


def test_chow_break_fires_same_line_quiet(spark):
    assert _run_chow(spark, BROKEN)["f_milli"] > 10_000  # F >> 10
    assert _run_chow(spark, SAME)["f_milli"] < 3_000  # F < 3


def test_chow_two_exact_lines_perfect_fit(spark):
    rows = [(1, x, 2 * x + 1) for x in range(10)] + [
        (2, x, 7 - 3 * x) for x in range(10)
    ]
    got = _run_chow(spark, rows)
    assert got["status"] == "perfect_fit"
    assert got["rss1_milli"] == 0 and got["rss2_milli"] == 0
    assert got["rssp_milli"] > 0
    assert got["f_milli"] is None


def test_chow_degenerate_guards(spark):
    got = _run_chow(spark, [(1, 5, 1), (1, 5, 2), (2, 1, 1), (2, 2, 2)])
    assert got["status"] == "degenerate"  # constant x in segment 1
    got2 = _run_chow(spark, [(1, 1, 1), (2, 1, 2), (2, 2, 3), (2, 3, 4)])
    assert got2["status"] == "degenerate"  # n1 < 3


def test_chow_segment_relabel_symmetric(spark):
    flipped = [(3 - s, x, y) for s, x, y in BROKEN]
    a = _run_chow(spark, BROKEN)
    b = _run_chow(spark, flipped)
    assert a["f_milli"] == b["f_milli"]
    assert a["rss1_milli"] == b["rss2_milli"]


# ----------------------------------------------------------- 2x2 panel


def test_2x2_matches_replay(spark):
    got = _run_2x2(spark, 12, 5, 7, 30)
    assert got == py_2x2(12, 5, 7, 30)


def test_2x2_independence_exact(spark):
    # rows proportional 2:1 -> no association
    got = _run_2x2(spark, 10, 30, 5, 15)
    assert got["or_ppm"] == 10**6 and got["rr_ppm"] == 10**6
    assert got["yule_q_ppm"] == 0 and got["rd_ppm"] == 0


def test_2x2_row_swap_inverts(spark):
    g1 = _run_2x2(spark, 12, 5, 7, 30)
    g2 = _run_2x2(spark, 7, 30, 12, 5)
    # each OR is floor-truncated by < 1 unit: product error < X + Y
    assert (
        abs(g1["or_ppm"] * g2["or_ppm"] - 10**12)
        <= g1["or_ppm"] + g2["or_ppm"]
    )
    assert g1["yule_q_ppm"] == -g2["yule_q_ppm"]
    assert g1["rd_ppm"] == -g2["rd_ppm"]


def test_2x2_zero_cells_null(spark):
    got = _run_2x2(spark, 5, 0, 3, 4)
    assert got["or_ppm"] is None  # b == 0
    assert got["rr_ppm"] is not None
    got2 = _run_2x2(spark, 5, 2, 0, 4)
    assert got2["rr_ppm"] is None and got2["or_ppm"] is None
