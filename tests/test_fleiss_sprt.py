"""Gates for Fleiss' kappa (evaluation/fleiss.py) and Wald's SPRT
(evaluation/sprt.py): Fleiss against the worked example structure and
an exact-Fraction replay, perfect/chance/constant-panel edges, the
drop contract for off-panel items; SPRT against a sequential Python
replay of the integer random walk, the pinned ppm constants of the
q327 lane, first-crossing semantics (a later re-crossing must not
change the decision), and the no-crossing 'continue' lane."""

from __future__ import annotations

import hashlib
from fractions import Fraction

from spanluke_spark.evaluation.fleiss import fleiss_kappa
from spanluke_spark.evaluation.sprt import sprt, wald_params


def h(*xs) -> int:
    return int.from_bytes(
        hashlib.md5(",".join(map(str, xs)).encode()).digest()[:4], "big"
    )


# -------------------------------------------------------------- Fleiss


def py_fleiss(items: dict, n: int):
    """items: {item: [category,...]} with exactly n entries each ->
    (pbar, pe, kappa) as Fractions (kappa None when pe == 1)."""
    from collections import Counter

    N = len(items)
    sq = sum(
        sum(c * c for c in Counter(v).values()) for v in items.values()
    )
    cj = Counter()
    for v in items.values():
        cj.update(v)
    a, b = sq - N * n, N * n * (n - 1)
    e, g = sum(c * c for c in cj.values()), (N * n) ** 2
    pbar, pe = Fraction(a, b), Fraction(e, g)
    kappa = None if pe == 1 else (pbar - pe) / (1 - pe)
    return pbar, pe, kappa


def _run_fleiss(spark, rows, n):
    df = spark.createDataFrame(rows, "item int, category string")
    return fleiss_kappa(df, n_raters=n).collect()[0]


def test_fleiss_matches_fraction_replay(spark):
    items = {
        i: [f"c{(i * 3 + (0 if h('a', i, r) % 10 < 7 else 1 + r % 3)) % 5}"
            for r in range(4)]
        for i in range(60)
    }
    rows = [(i, c) for i, v in items.items() for c in v]
    got = _run_fleiss(spark, rows, 4)
    pbar, pe, kappa = py_fleiss(items, 4)
    assert got["n_items"] == 60 and got["n_dropped"] == 0
    assert got["pbar_ppm"] == pbar.numerator * 10**6 // pbar.denominator
    assert got["pe_ppm"] == pe.numerator * 10**6 // pe.denominator
    assert Fraction(got["kappa_num"], got["kappa_den"]) == kappa
    mag = abs(got["kappa_num"]) * 10**6 // got["kappa_den"]
    assert got["kappa_ppm"] == (-mag if got["kappa_num"] < 0 else mag)


def test_fleiss_perfect_chance_and_constant_edges(spark):
    # perfect agreement -> kappa = 1
    rows = [(i, f"c{i % 3}") for i in range(30) for _ in range(3)]
    got = _run_fleiss(spark, rows, 3)
    assert Fraction(got["kappa_num"], got["kappa_den"]) == 1
    # one category everywhere -> pe = 1 -> kappa NULL
    rows = [(i, "c0") for i in range(20) for _ in range(3)]
    got = _run_fleiss(spark, rows, 3)
    assert got["kappa_ppm"] is None and got["pe_ppm"] == 1_000_000
    # negative kappa: raters disagree MORE than chance (round-robin)
    rows = [(i, f"c{(i + r) % 2}") for i in range(20) for r in range(2)]
    got = _run_fleiss(spark, rows, 2)
    assert got["kappa_num"] < 0 and got["kappa_ppm"] < 0


def test_fleiss_drops_off_panel_items(spark):
    rows = [(i, f"c{r % 2}") for i in range(10) for r in range(3)]
    rows += [(99, "c0")] * 5  # five ratings -> off the 3-rater panel
    got = _run_fleiss(spark, rows, 3)
    assert got["n_items"] == 10 and got["n_dropped"] == 1


# ---------------------------------------------------------------- SPRT


PARAMS = wald_params(0.4, 0.6, 0.05, 0.05)


def test_wald_params_pins_the_lane_constants():
    assert PARAMS == {
        "inc1_ppm": 405465,
        "inc0_ppm": -405465,
        "upper_ppm": 2944439,
        "lower_ppm": -2944439,
    }


def py_sprt(outcomes, p):
    """First-crossing decision, but the walk keeps accumulating: the
    module reports final_llr over ALL rows (n_seen is the full
    stream), matching its group-totals contract."""
    llr, hist, dec, t_dec, llr_dec = 0, [], "continue", None, None
    for t, o in enumerate(outcomes):
        llr += p["inc1_ppm"] if o else p["inc0_ppm"]
        hist.append(llr)
        if dec == "continue":
            if llr >= p["upper_ppm"]:
                dec, t_dec, llr_dec = "accept_h1", t, llr
            elif llr <= p["lower_ppm"]:
                dec, t_dec, llr_dec = "accept_h0", t, llr
    return dec, t_dec, llr_dec, hist


def _run_sprt(spark, rows):
    df = spark.createDataFrame(rows, "grp int, pos int, outcome boolean")
    return {r["grp"]: r for r in sprt(df, **PARAMS).collect()}


def test_sprt_matches_sequential_python_replay(spark):
    rows, exp = [], {}
    for g in range(10):
        outs = [h("o", g, t) % 100 < 25 + g * 6 for t in range(60)]
        rows += [(g, t, o) for t, o in enumerate(outs)]
        exp[g] = py_sprt(outs, PARAMS)
    got = _run_sprt(spark, rows)
    decided = 0
    for g, (dec, t, llr, hist) in exp.items():
        r = got[g]
        assert r["decision"] == dec, g
        assert r["n_seen"] == 60 and r["final_llr_ppm"] == hist[-1]
        if t is not None:
            decided += 1
            assert (r["t_decide"], r["llr_at_decision_ppm"]) == (t, llr), g
        else:
            assert r["t_decide"] is None
    assert decided >= 6  # the planted spread actually decides mostly


def test_sprt_first_crossing_wins_even_if_walk_returns(spark):
    # 8 successes (crosses upper at t=7: 8*405465 = 3243720), then a
    # long failure run that would cross the LOWER boundary later
    outs = [True] * 8 + [False] * 30
    rows = [(0, t, o) for t, o in enumerate(outs)]
    got = _run_sprt(spark, rows)[0]
    assert got["decision"] == "accept_h1" and got["t_decide"] == 7
    assert got["llr_at_decision_ppm"] == 8 * 405465
    # the walk did in fact end deep negative — proving the trap is real
    assert got["final_llr_ppm"] == (8 - 30) * 405465


def test_sprt_continue_band(spark):
    # perfect alternation hovers at 0 / +-405465: never crosses
    rows = [(0, t, t % 2 == 0) for t in range(40)]
    got = _run_sprt(spark, rows)[0]
    assert got["decision"] == "continue" and got["t_decide"] is None
    assert got["final_llr_ppm"] == 0
