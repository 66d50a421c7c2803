"""Gates for evaluation/orhomog.py: Woolf — bit-exact python replay
of the micro-nat/milli-weight pipeline, identical-strata EXACT zero
(the X^2/Z divisibility argument), planted OR-flip heterogeneity
fires, homogeneous-but-different-margins quiet, zero-cell
drop-and-count; Breslow-Day — float replay parity (same IEEE
expressions), admissible-root audit (fitted cell inside its margins,
fitted table reproduces R), Tarone correction <= BD, fires/quiets
WITH Woolf on the shared fixtures."""

from __future__ import annotations

import math

from spanluke_spark.evaluation.orhomog import (
    breslow_day,
    woolf_homogeneity,
)

# ---------------------------------------------------- python replays


def py_woolf(strata):
    kept = [t for t in strata if all(x > 0 for x in t)]
    x = y = z = 0
    for a, b, c, d in kept:
        l_cell = round(math.log(a * d) * 1e6) - round(
            math.log(b * c) * 1e6
        )
        w_m = (a * b * c * d * 1000) // (
            b * c * d + a * c * d + a * b * d + a * b * c
        )
        x += w_m * l_cell
        y += w_m * l_cell * l_cell
        z += w_m
    if z <= 0 or len(kept) < 2:
        return None
    return (y - x * x // z) // 10**12


def py_bd(strata):
    kept = [t for t in strata if all(x > 0 for x in t)]
    rp = sum(a * d / (a + b + c + d) for a, b, c, d in kept)
    rq = sum(b * c / (a + b + c + d) for a, b, c, d in kept)
    r = rp / rq
    bd = dev = v_sum = 0.0
    fits = []
    for a, b, c, d in kept:
        m1, n1, t = float(a + b), float(a + c), float(a + b + c + d)
        if abs(r - 1.0) < 1e-12:
            ah = m1 * n1 / t
        else:
            bq = r * (m1 + n1) + t - m1 - n1
            ah = (-bq + math.sqrt(bq * bq + 4 * (1 - r) * r * m1 * n1)) / (
                2 * (1 - r)
            )
        v = 1.0 / (
            1.0 / ah
            + 1.0 / (m1 - ah)
            + 1.0 / (n1 - ah)
            + 1.0 / (t - m1 - n1 + ah)
        )
        fits.append((ah, m1, n1, t))
        bd += (a - ah) ** 2 / v
        dev += a - ah
        v_sum += v
    bdt = bd - dev * dev / v_sum
    return r, bd, bdt, fits


def _mk(spark, strata):
    rows = [(i, *t) for i, t in enumerate(strata)]
    return spark.createDataFrame(
        rows, "s long, a long, b long, c long, d long"
    )


HOMOG = [(10, 20, 5, 40), (20, 40, 10, 80), (5, 10, 3, 24)]
HETERO = [(40, 10, 10, 40), (10, 40, 40, 10), (30, 15, 12, 25)]


# ------------------------------------------------------------- woolf


def test_woolf_identical_strata_exact_zero(spark):
    strata = [(12, 7, 9, 21)] * 4
    got = woolf_homogeneity(_mk(spark, strata)).collect()[0]
    assert got.status == "ok"
    assert got.chi2_milli == 0
    assert got.sig05 is False


def test_woolf_replay(spark):
    strata = [
        (8, 15, 6, 30),
        (22, 9, 17, 14),
        (5, 25, 11, 40),
        (13, 13, 8, 21),
    ]
    want = py_woolf(strata)
    got = woolf_homogeneity(_mk(spark, strata)).collect()[0]
    assert got.status == "ok"
    assert got.chi2_milli == want


def test_woolf_flip_fires_homog_quiet(spark):
    fire = woolf_homogeneity(_mk(spark, HETERO)).collect()[0]
    assert fire.sig05 is True
    quiet = woolf_homogeneity(_mk(spark, HOMOG)).collect()[0]
    assert quiet.sig05 is False


def test_woolf_zero_cell_dropped(spark):
    strata = [(10, 20, 5, 40), (0, 9, 4, 17), (20, 40, 10, 80)]
    got = woolf_homogeneity(_mk(spark, strata)).collect()[0]
    assert got.dropped == 1
    assert got.k_used == 2
    assert got.status == "ok"


def test_woolf_single_stratum_degenerate(spark):
    got = woolf_homogeneity(_mk(spark, [(5, 6, 7, 8)])).collect()[0]
    assert got.status == "degenerate"
    assert got.chi2_milli is None


# ------------------------------------------------------ breslow-day


def test_bd_float_replay_and_root_audit(spark):
    strata = [
        (8, 15, 6, 30),
        (22, 9, 17, 14),
        (5, 25, 11, 40),
        (13, 13, 8, 21),
    ]
    r, bd, bdt, fits = py_bd(strata)
    got = breslow_day(_mk(spark, strata)).collect()[0]
    assert got.status == "ok"
    assert abs(got.r_ppm - round(r * 1e6)) <= 1
    assert abs(got.bd_milli - round(bd * 1000)) <= 1
    assert abs(got.bdt_milli - round(bdt * 1000)) <= 1
    # Tarone removes a nonnegative term
    assert got.bdt_milli <= got.bd_milli
    # admissible root: inside the margins, fitted table reproduces R
    for ah, m1, n1, t in fits:
        assert 0 < ah < min(m1, n1)
        dh = t - m1 - n1 + ah
        assert dh > 0
        or_fit = ah * dh / ((m1 - ah) * (n1 - ah))
        assert abs(or_fit - r) < 1e-9


def test_bd_fires_and_quiets_with_woolf(spark):
    fire = breslow_day(_mk(spark, HETERO)).collect()[0]
    assert fire.status == "ok"
    assert fire.sig05 is True
    quiet = breslow_day(_mk(spark, HOMOG)).collect()[0]
    assert quiet.status == "ok"
    assert quiet.sig05 is False


def test_bd_identical_strata_near_zero(spark):
    strata = [(12, 7, 9, 21)] * 4
    got = breslow_day(_mk(spark, strata)).collect()[0]
    assert got.status == "ok"
    assert abs(got.bd_milli) <= 1
    assert got.sig05 is False


def test_bd_zero_cell_dropped(spark):
    strata = [(10, 20, 5, 40), (3, 0, 4, 17), (20, 40, 10, 80)]
    got = breslow_day(_mk(spark, strata)).collect()[0]
    assert got.dropped == 1
    assert got.k_used == 2
