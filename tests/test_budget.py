"""Largest-remainder apportionment: exact-sum invariant, proportionality,
remainder tie-break, and quota monotonicity in score."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.etl.budget import apportion_budget


def _scores(spark, rows):
    return spark.createDataFrame(rows, "host string, score double")


def test_hand_computed_hamilton(spark):
    # B=10, scores 5/3/2 -> ideals 5.0/3.0/2.0 exact, no remainders
    out = {r.host: r.quota for r in
           apportion_budget(_scores(spark, [("a", 5.0), ("b", 3.0), ("c", 2.0)]), 10).collect()}
    assert out == {"a": 5, "b": 3, "c": 2}
    # B=10, scores 1/1/1 -> ideals 3.33.. -> bases 3,3,3, one seat left,
    # equal remainders -> host asc tie-break gives it to 'a'
    out = {r.host: r.quota for r in
           apportion_budget(_scores(spark, [("a", 1.0), ("b", 1.0), ("c", 1.0)]), 10).collect()}
    assert out == {"a": 4, "b": 3, "c": 3}


def test_sum_invariant_random(spark):
    rows = [(f"h{i}", float((i * 37) % 11 + 1)) for i in range(40)]
    for budget in (7, 100, 991):
        df = apportion_budget(_scores(spark, rows), budget)
        assert df.agg(F.sum("quota")).collect()[0][0] == budget
        assert df.agg(F.min("quota")).collect()[0][0] >= 0


def test_bigger_score_never_gets_less(spark):
    rows = [("a", 10.0), ("b", 5.0), ("c", 1.0)]
    out = {r.host: r.quota for r in apportion_budget(_scores(spark, rows), 17).collect()}
    assert out["a"] >= out["b"] >= out["c"]
