"""Bucketed co-located join: same-bucketed tables join with ZERO Exchange —
the 100 TB lever for repeated fact-fact joins (orders x lineitem here;
pages x mentions in the KG pipeline)."""

from pyspark.sql import functions as F

from spanluke_spark.storage.tables import read_bucketed, write_bucketed


def _drop(spark, name):
    """DROP TABLE + remove any orphaned warehouse dir a crashed run left
    (a fresh session's catalog doesn't know about the old location)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:")
    shutil.rmtree(f"{wh}/{name}", ignore_errors=True)


def test_bucketed_join_is_shuffle_free(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    _drop(spark, "b_orders")
    _drop(spark, "b_lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", ["o_orderkey"], 8
    )

    bo, bl = read_bucketed(spark, "b_orders"), read_bucketed(spark, "b_lineitem")
    # disable broadcast so the plan exercises the co-located merge join (at
    # test SF the dim side is broadcastable; at 100 TB neither side is)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderpriority").agg(
            F.sum("l_quantity").alias("q")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the join itself must not shuffle either side (bucket co-location);
        # only the small post-join agg may exchange on o_orderpriority
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        assert "SelectedBucketsCount: 8 out of 8" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    # correctness: identical to the plain (shuffling) join
    plain = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum("l_quantity").alias("q"))
    )
    got = {(r.o_orderpriority, float(r.q)) for r in joined.collect()}
    want = {(r.o_orderpriority, float(r.q)) for r in plain.collect()}
    assert got == want

    _drop(spark, "b_orders")
    _drop(spark, "b_lineitem")
