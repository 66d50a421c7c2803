"""nervaluate-style metric DataFrame ops (SURVEY §2.4 A1/A2, §2.7 U3)."""

import math

from spanluke_spark.evaluation.metrics import nervaluate_counts, strict_prf


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc string, start int, end int, label string")


def test_strict_prf_perfect_and_empty(spark):
    gold = _df(spark, [("d1", 0, 5, "COURT"), ("d1", 10, 15, "JUDGE")])
    m = strict_prf(gold, gold)
    assert m["tp"] == 2 and m["fn"] == 0 and m["fp"] == 0
    assert math.isclose(m["f1"], 1.0, abs_tol=1e-6)

    empty = _df(spark, []).limit(0)
    m0 = strict_prf(gold, empty)
    assert m0["precision"] == 0.0 and m0["recall"] == 0.0


def test_strict_prf_mixed(spark):
    gold = _df(spark, [("d1", 0, 5, "COURT"), ("d1", 10, 15, "JUDGE"), ("d2", 0, 3, "ORG")])
    pred = _df(
        spark,
        [
            ("d1", 0, 5, "COURT"),   # TP
            ("d1", 10, 15, "COURT"), # boundary ok, type wrong -> FP (+FN)
            ("d2", 5, 8, "ORG"),     # no overlap w/ gold span -> FP (+FN)
        ],
    )
    m = strict_prf(gold, pred)
    assert (m["tp"], m["fn"], m["fp"]) == (1, 2, 2)
    assert math.isclose(m["precision"], 1 / 3, abs_tol=1e-9)
    assert math.isclose(m["recall"], 1 / 3, abs_tol=1e-9)


def test_nervaluate_counts_regimes(spark):
    # gold: 3 entities; pred: exact+type, exact boundary wrong type,
    # overlap right type, spurious
    gold = _df(
        spark,
        [("d1", 0, 5, "COURT"), ("d1", 10, 15, "JUDGE"), ("d1", 20, 25, "ORG")],
    )
    pred = _df(
        spark,
        [
            ("d1", 0, 5, "COURT"),    # COR everywhere
            ("d1", 10, 15, "COURT"),  # strict INC, exact COR, ent_type INC
            ("d1", 21, 27, "ORG"),    # overlap: strict INC, partial PAR, ent_type COR
            ("d1", 40, 45, "GPE"),    # SPU
        ],
    )
    rows = {r.regime: r for r in nervaluate_counts(gold, pred).collect()}

    s = rows["strict"]
    assert (s.cor, s.inc, s.par, s.mis, s.spu) == (1, 2, 0, 0, 1)
    # precision = 1/4, recall = 1/3
    assert math.isclose(s.precision, 0.25, abs_tol=1e-9)
    assert math.isclose(s.recall, 1 / 3, abs_tol=1e-9)

    e = rows["exact"]
    assert (e.cor, e.inc, e.par, e.mis, e.spu) == (2, 1, 0, 0, 1)

    p = rows["partial"]
    assert (p.cor, p.inc, p.par, p.mis, p.spu) == (2, 0, 1, 0, 1)
    # precision = (2 + 0.5)/4
    assert math.isclose(p.precision, 2.5 / 4, abs_tol=1e-9)

    t = rows["ent_type"]
    assert (t.cor, t.inc, t.par, t.mis, t.spu) == (2, 1, 0, 0, 1)
