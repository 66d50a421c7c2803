"""Gates for evaluation/rank2.py: Brunner-Munzel against a float
lawstat-formula replay (midranks, per-group rank variances,
Satterthwaite df), identical-multisets EXACT zero with p_hat exactly
500000, complete-separation 'separated' lane with p_hat exactly 1e6,
planted shift fires; Cucconi against a Fraction-exact replay of the
cleared rational AND the float textbook (U, V, rho) form, shift and
scale alternatives both fire, interleaved-quiet, C >= 0 property,
declared no-ties audit."""

from __future__ import annotations

from fractions import Fraction

from spanluke_spark.evaluation.rank2 import brunner_munzel, cucconi

# ---------------------------------------------------- python replays


def py_bm(rows):
    """Float lawstat replay -> (bm2, df, p_hat)."""
    xs = sorted(x for _, x in rows)

    def midrank(v, pool):
        less = sum(1 for u in pool if u < v)
        eq = sum(1 for u in pool if u == v)
        return less + (eq + 1) / 2

    g1 = [x for g, x in rows if g == 0]
    g2 = [x for g, x in rows if g != 0]
    n1, n2 = len(g1), len(g2)
    big_n = n1 + n2
    r1 = [midrank(v, xs) for v in g1]
    r2 = [midrank(v, xs) for v in g2]
    w1 = [midrank(v, g1) for v in g1]
    w2 = [midrank(v, g2) for v in g2]
    m1, m2 = sum(r1) / n1, sum(r2) / n2
    v1 = sum(
        (r - w - m1 + (n1 + 1) / 2) ** 2 for r, w in zip(r1, w1)
    ) / (n1 - 1)
    v2 = sum(
        (r - w - m2 + (n2 + 1) / 2) ** 2 for r, w in zip(r2, w2)
    ) / (n2 - 1)
    sig = n1 * v1 + n2 * v2
    bm2 = n1 * n1 * n2 * n2 * (m2 - m1) ** 2 / (big_n * big_n * sig)
    df = sig**2 / ((n1 * v1) ** 2 / (n1 - 1) + (n2 * v2) ** 2 / (n2 - 1))
    p_hat = (m2 - (n2 + 1) / 2) / n1
    return bm2, df, p_hat


def py_cucconi(rows):
    """Fraction-exact replay of the cleared rational + float C."""
    xs = sorted(x for _, x in rows)
    assert len(set(xs)) == len(xs), "no-ties fixture required"
    big_n = len(xs)
    rank = {v: i + 1 for i, v in enumerate(xs)}
    r2 = [rank[x] for g, x in rows if g != 0]
    n = len(r2)
    m = big_n - n
    s2 = sum(r * r for r in r2)
    s2r = sum((big_n + 1 - r) ** 2 for r in r2)
    nu = 6 * s2 - n * (big_n + 1) * (2 * big_n + 1)
    nv = 6 * s2r - n * (big_n + 1) * (2 * big_n + 1)
    q = (2 * big_n + 1) * (8 * big_n + 11)
    p = 2 * (big_n * big_n - 4) - q
    c = Fraction(
        5 * (q * (nu * nu + nv * nv) - 2 * p * nu * nv),
        2 * (q - p) * (q + p) * m * n * (big_n + 1),
    )
    return nu, nv, c


def _mk(spark, rows):
    return spark.createDataFrame(rows, "grp long, x long")


# ---------------------------------------------------- brunner-munzel


def test_bm_identical_multisets_exact_zero(spark):
    vals = [1, 3, 3, 7, 9, 12, 12, 20]
    rows = [(0, v) for v in vals] + [(1, v) for v in vals]
    got = brunner_munzel(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.bm2_milli == 0
    assert got.p_hat_ppm == 500000
    assert got.sig05 is False


def test_bm_float_parity_with_ties(spark):
    rows = [
        (i % 2, ((i * 13 + 7) % 23) + 4 * (i % 2) + (i % 3))
        for i in range(46)
    ]
    bm2, dfree, p_hat = py_bm(rows)
    got = brunner_munzel(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert abs(got.bm2_milli / 1000 - bm2) < 2e-3
    assert abs(got.df_milli / 1000 - dfree) < 2e-3
    assert abs(got.p_hat_ppm / 1e6 - p_hat) < 2e-6


def test_bm_separated_lane(spark):
    rows = [(0, v) for v in range(10)] + [
        (1, v) for v in range(100, 110)
    ]
    got = brunner_munzel(_mk(spark, rows)).collect()[0]
    assert got.status == "separated"
    assert got.bm2_milli is None
    assert got.p_hat_ppm == 1000000


def test_bm_planted_shift_fires(spark):
    rows = [(0, v) for v in range(24)] + [
        (1, v + 14) for v in range(24)
    ]
    got = brunner_munzel(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.sig05 is True
    assert got.p_hat_ppm > 750000


def test_bm_degenerate(spark):
    got = brunner_munzel(
        _mk(spark, [(0, 1), (1, 5), (1, 9)])
    ).collect()[0]
    assert got.status == "degenerate"
    assert got.bm2_milli is None


# ----------------------------------------------------------- cucconi


def test_cucconi_fraction_replay(spark):
    rows = [(i % 2, i * 7 + (i * i) % 5) for i in range(30)]
    xs = [x for _, x in rows]
    assert len(set(xs)) == len(xs)
    nu, nv, c = py_cucconi(rows)
    got = cucconi(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert (got.nu, got.nv) == (nu, nv)
    assert got.c_milli == (c.numerator * 1000) // c.denominator
    assert got.c_milli >= 0


def test_cucconi_shift_fires(spark):
    rows = [(0, 2 * v) for v in range(20)] + [
        (1, 2 * v + 61) for v in range(20)
    ]
    got = cucconi(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.sig05 is True


def test_cucconi_scale_fires_location_free(spark):
    # sample 2 occupies BOTH extremes, medians agree -> the scale
    # half of the omnibus fires (this is what pure Mann-Whitney
    # cannot see; cf. Lepage q426's decomposition lanes)
    g1 = [(0, v) for v in range(100, 121)]  # 21 central values
    g2 = [(1, v) for v in range(0, 10)] + [
        (1, v) for v in range(200, 211)
    ]
    got = cucconi(_mk(spark, g1 + g2)).collect()[0]
    assert got.status == "ok"
    assert got.sig05 is True


def test_cucconi_interleaved_quiet(spark):
    rows = [(i % 2, i) for i in range(40)]
    got = cucconi(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.sig05 is False
    assert got.c_milli >= 0


def test_cucconi_ties_audit(spark):
    rows = [(0, 1), (0, 2), (1, 2), (1, 3), (0, 5), (1, 7)]
    got = cucconi(_mk(spark, rows)).collect()[0]
    assert got.status == "ties"
    assert got.c_milli is None
