"""Gates for etl/budget.divisor_apportionment and textops/
powerlaw.powerlaw_alpha: divisor methods against an exact python
replay with the same tie-break, the classic 7-seat textbook election
(D'Hondt 3/2/1/1/0 vs Sainte-Lague 2/2/1/1/1 splitting the small
parties differently), per-method sum == budget, zero-score
exclusion, D'Hondt-favors-large vs SL balance on a skewed profile;
power-law MLE against a quantized replay AND the float CSN formula,
the exact scaling-invariance lane, all-at-xmin NULL, and the
heavier-tail -> smaller-alpha ordering."""

from __future__ import annotations

import math

from spanluke_spark.etl.budget import divisor_apportionment
from spanluke_spark.textops.powerlaw import powerlaw_alpha

# ---------------------------------------------------- python replays


def py_divisor(scores, budget):
    out = {}
    for divs in ("dhondt", "sl"):
        quots = []
        for host, v in scores.items():
            for r in range(1, budget + 1):
                d = r if divs == "dhondt" else 2 * r - 1
                quots.append((-v / d, -v, host, r))
        quots.sort()
        won = {}
        for _, _, host, _ in quots[:budget]:
            won[host] = won.get(host, 0) + 1
        out[divs] = won
    return {
        h: {
            "score": v,
            "seats_dhondt": out["dhondt"].get(h, 0),
            "seats_sainte_lague": out["sl"].get(h, 0),
        }
        for h, v in scores.items()
    }


def py_alpha(xs, xmin):
    tail = [x for x in xs if x >= xmin]
    n = len(tail)
    sl = sum(round(math.log(x / xmin) * 10**6) for x in tail)
    if n == 0 or sl <= 0:
        return {"xmin": xmin, "n_tail": n, "sum_l": sl,
                "alpha_milli": None, "se2_micro": None}
    a = 1000 * n * 10**6 // sl
    return {
        "xmin": xmin, "n_tail": n, "sum_l": sl,
        "alpha_milli": 1000 + a, "se2_micro": a * a // n,
    }


def _run_div(spark, scores, budget):
    df = spark.createDataFrame(
        [(h, v) for h, v in scores.items()], "host string, score long"
    )
    out = {}
    for r in divisor_apportionment(df, budget).collect():
        d = r.asDict()
        out[d.pop("host")] = d
    return out


def _run_alpha(spark, xs, xmin):
    df = spark.createDataFrame([(int(v),) for v in xs], "x long")
    return powerlaw_alpha(df, xmin).collect()[0].asDict()


# ------------------------------------------------------- apportionment


CLASSIC = {"A": 340_000, "B": 280_000, "C": 160_000, "D": 60_000,
           "E": 15_000}


def test_divisor_classic_election(spark):
    got = _run_div(spark, CLASSIC, 7)
    assert got == py_divisor(CLASSIC, 7)
    # hand check: D'Hondt top-7 quotients 340 280 170 160 140 113.3
    # 93.3 -> A3 B3 C1; Sainte-Lague (divisors 1,3,5) top-7 340 280
    # 160 113.3 93.3 68 60 -> the 7th seat goes to D instead of A
    assert [got[p]["seats_dhondt"] for p in "ABCDE"] == [3, 3, 1, 0, 0]
    assert [got[p]["seats_sainte_lague"] for p in "ABCDE"] == [
        3, 2, 1, 1, 0,
    ]


def test_divisor_sums_and_zero_score(spark):
    scores = {"x": 500, "y": 300, "z": 200, "dead": 0}
    got = _run_div(spark, scores, 10)
    assert got == py_divisor(scores, 10)
    for col in ("seats_dhondt", "seats_sainte_lague"):
        assert sum(v[col] for v in got.values()) == 10
    assert got["dead"]["seats_dhondt"] == 0
    assert got["dead"]["seats_sainte_lague"] == 0


def test_divisor_dhondt_favors_large(spark):
    scores = {"big": 1000, "s1": 99, "s2": 98, "s3": 97}
    got = _run_div(spark, scores, 12)
    assert got == py_divisor(scores, 12)
    assert got["big"]["seats_dhondt"] >= got["big"]["seats_sainte_lague"]


def test_divisor_quotient_tie_break(spark):
    # 600/2 == 300/1: tie resolved by score DESC -> host 'p' wins it
    scores = {"p": 600, "q": 300}
    got = _run_div(spark, scores, 2)
    assert got == py_divisor(scores, 2)
    assert got["p"]["seats_dhondt"] == 2  # wait-free check vs replay


# ----------------------------------------------------------- power law


XS = [int(2 * (1.5 ** (i % 9))) + i % 3 for i in range(120)]


def test_alpha_matches_replay_and_float(spark):
    got = _run_alpha(spark, XS, 3)
    assert got == py_alpha(XS, 3)
    tail = [x for x in XS if x >= 3]
    a_f = 1 + len(tail) / sum(math.log(x / 3) for x in tail)
    assert abs(got["alpha_milli"] - a_f * 1000) <= 2


def test_alpha_scaling_invariance_bit_exact(spark):
    a = _run_alpha(spark, XS, 3)
    b = _run_alpha(spark, [7 * x for x in XS], 21)
    assert a["alpha_milli"] == b["alpha_milli"]
    assert a["sum_l"] == b["sum_l"]


def test_alpha_all_at_xmin_null(spark):
    got = _run_alpha(spark, [5] * 20, 5)
    assert got["alpha_milli"] is None and got["se2_micro"] is None


def test_alpha_heavier_tail_smaller(spark):
    light = [2 + i % 4 for i in range(60)]  # narrow range
    heavy = [2 * 2 ** (i % 7) for i in range(60)]  # wide range
    al = _run_alpha(spark, light, 2)["alpha_milli"]
    ah = _run_alpha(spark, heavy, 2)["alpha_milli"]
    assert ah < al
