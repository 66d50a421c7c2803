"""Bucketed-table gates (storage/bucketing.py): a join between two
tables bucketed on the same key plans with ZERO shuffle Exchange and
returns exactly what the shuffled join returns; mismatched bucket
layouts fall back to a correct (exchanging) plan; aggregation on the
bucket key is also exchange-free.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from spanluke_spark.storage.bucketing import (
    assert_no_exchange,
    bucketed_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def tables(spark):
    rng = np.random.default_rng(8)
    left = spark.createDataFrame(
        [(int(u), int(v)) for u, v in zip(rng.integers(0, 50, 400), rng.integers(0, 1000, 400))],
        "user_id long, value long",
    )
    right = spark.createDataFrame(
        [(int(u), f"seg{u % 7}") for u in range(50)], "user_id long, segment string"
    )
    write_bucketed(left, "bk_left", "user_id", n_buckets=8)
    write_bucketed(right, "bk_right", "user_id", n_buckets=8)
    yield left, right
    for t in ("bk_left", "bk_right"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_no_exchange_and_correct(spark, tables):
    left, right = tables
    # force SortMergeJoin so the exchange-free claim is about bucketing,
    # not about the small side getting broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "bk_left", "bk_right", "user_id")
        assert_no_exchange(joined)
        got = sorted(map(tuple, joined.collect()))
        want = sorted(map(tuple, left.join(right, "user_id").collect()))
        assert got == want and len(got) == 400
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_no_exchange(spark, tables):
    agg = (
        spark.table("bk_left")
        .groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    assert_no_exchange(agg)
    left, _ = tables
    want = {
        (r["user_id"], r["s"], r["n"])
        for r in left.groupBy("user_id")
        .agg(F.sum("value").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {tuple(r) for r in agg.collect()} == want


def test_mismatched_buckets_fall_back_correctly(spark, tables):
    left, right = tables
    write_bucketed(right, "bk_right12", "user_id", n_buckets=12)
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bk_left", "bk_right12", "user_id")
        with pytest.raises(AssertionError):
            assert_no_exchange(joined)  # incompatible layouts must exchange
        assert joined.count() == 400  # but stay correct
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bk_right12")


def test_assert_no_exchange_flags_shuffles(spark, tables):
    left, _ = tables
    with pytest.raises(AssertionError, match="Exchange"):
        assert_no_exchange(left.groupBy("user_id").count())
