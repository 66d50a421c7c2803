"""Count-min sketch: the overestimate guarantee, exactness when w is wide,
merge-by-addition, bounded sketch size, and the broadcast plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.textops.sketch import cms_build, cms_estimate


def _items(spark, counts):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "item string")


def test_never_underestimates_and_exact_when_wide(spark):
    counts = {f"t{i}": (i % 5) + 1 for i in range(40)}
    df = _items(spark, counts)
    sketch = cms_build(df, F.col("item"), d=3, w=4096)
    probes = spark.createDataFrame([(k,) for k in counts], "item string")
    got = {r.item: r.est for r in cms_estimate(sketch, probes, d=3, w=4096).collect()}
    for k, n in counts.items():
        assert got[k] >= n  # CMS can only over-count
        # at w=4096 with 40 keys, collisions in all 3 rows are implausible
        assert got[k] == n


def test_absent_item_estimates_zero_or_collision(spark):
    df = _items(spark, {"a": 5})
    sketch = cms_build(df, F.col("item"), d=3, w=1024)
    probes = spark.createDataFrame([("zzz",)], "item string")
    est = cms_estimate(sketch, probes, d=3, w=1024).collect()[0].est
    assert est in (0, 5)  # 0 unless zzz collides with a in all rows


def test_sketch_size_bounded_and_merge_by_addition(spark):
    d, w = 3, 16
    left = cms_build(_items(spark, {"a": 3, "b": 2}), F.col("item"), d=d, w=w)
    right = cms_build(_items(spark, {"a": 1, "c": 7}), F.col("item"), d=d, w=w)
    assert left.count() <= d * w and right.count() <= d * w
    merged = (
        left.unionByName(right)
        .groupBy("hrow", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    both = cms_build(_items(spark, {"a": 4, "b": 2, "c": 7}), F.col("item"), d=d, w=w)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, both.collect()))


def test_estimate_plan_broadcasts_sketch(spark):
    df = _items(spark, {"a": 2, "b": 1})
    sketch = cms_build(df, F.col("item"), d=3, w=64)
    probes = spark.createDataFrame([("a",)], "item string")
    plan = (
        cms_estimate(sketch, probes, d=3, w=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
