"""Wilson host health (statsmodels-free closed-form parity, the
small-n honesty property, SLA breach semantics, bound clamps) and
average precision (textbook worked example, recall penalty, perfect
ranking anchor, R=0 drop)."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from spanluke_spark.etl.health import host_health_wilson
from spanluke_spark.evaluation.ranking import average_precision_at_k


def _py_wilson(n, s, z=1.96):
    p = s / n
    z2 = z * z
    denom = 1 + z2 / n
    center = (p + z2 / (2 * n)) / denom
    half = z * math.sqrt(p * (1 - p) / n + z2 / (4 * n * n)) / denom
    return max(center - half, 0.0), min(center + half, 1.0)


def _spark_health(spark, outcomes, sla=0.9):
    rows = [(h, ok) for h, oks in outcomes.items() for ok in oks]
    df = spark.createDataFrame(rows, "host: string, ok: boolean")
    out = host_health_wilson(df, F.col("host"), F.col("ok"), sla=sla).collect()
    return {r["host"]: r for r in out}


def test_wilson_closed_form_parity(spark):
    outcomes = {
        "good": [True] * 190 + [False] * 10,
        "bad": [True] * 120 + [False] * 80,
        "tiny_fail": [False, False],
        "tiny_ok": [True, True, True],
    }
    got = _spark_health(spark, outcomes)
    for h, oks in outcomes.items():
        lo, hi = _py_wilson(len(oks), sum(oks))
        assert got[h]["wilson_lo"] == pytest.approx(round(lo, 6), abs=1e-6)
        assert got[h]["wilson_hi"] == pytest.approx(round(hi, 6), abs=1e-6)


def test_small_n_is_not_breached(spark):
    # 0/2 successes: point estimate 0 but Wilson upper ~0.66 < 0.9 ->
    # hmm: upper bound of 0/2 IS below 0.9? check: n=2,s=0
    lo, hi = _py_wilson(2, 0)
    got = _spark_health(spark, {"h": [False, False]})["h"]
    assert got["breach"] == (hi < 0.9)
    # 1/2: upper bound ~0.905 > 0.9 -> NOT breached despite rate 0.5
    got2 = _spark_health(spark, {"h": [True, False]})["h"]
    assert got2["rate"] == 0.5 and not got2["breach"]


def test_large_n_breach_certain(spark):
    got = _spark_health(spark, {"h": [True] * 160 + [False] * 40})["h"]
    assert got["breach"]  # 80% at n=200: upper bound well below 0.9


def test_bounds_clamped(spark):
    got = _spark_health(spark, {"h": [True] * 3})["h"]
    assert 0.0 <= got["wilson_lo"] and got["wilson_hi"] <= 1.0


def _spark_ap(spark, results, rel, k=10):
    r = spark.createDataFrame(results, "query_id: long, doc_id: long, score: double")
    j = spark.createDataFrame(rel, "query_id: long, doc_id: long")
    return {
        row["query_id"]: (row["n_rel"], row["ap"])
        for row in average_precision_at_k(r, j, k=k).collect()
    }


def test_ap_worked_example(spark):
    # ranking: d1(rel) d2 d3(rel) d4 d5(rel); R=3
    results = [(1, d, 10.0 - d) for d in range(1, 6)]
    rel = [(1, 1), (1, 3), (1, 5)]
    got = _spark_ap(spark, results, rel, k=5)
    want = (1 / 1 + 2 / 3 + 3 / 5) / 3
    assert got[1] == (3, pytest.approx(round(want, 6)))


def test_ap_recall_penalty_for_unretrieved(spark):
    # 2 relevant docs exist; ranking only surfaces one -> denominator 2
    results = [(1, 1, 5.0), (1, 2, 4.0)]
    rel = [(1, 1), (1, 99)]
    got = _spark_ap(spark, results, rel)
    assert got[1] == (2, pytest.approx(0.5))


def test_ap_perfect_ranking_is_one(spark):
    results = [(1, d, 100.0 - d) for d in range(1, 6)]
    rel = [(1, 1), (1, 2), (1, 3)]
    got = _spark_ap(spark, results, rel, k=5)
    assert got[1] == (3, 1.0)


def test_ap_queries_without_judgments_dropped(spark):
    results = [(1, 1, 1.0), (2, 1, 1.0)]
    rel = [(1, 1)]
    got = _spark_ap(spark, results, rel)
    assert set(got) == {1}
