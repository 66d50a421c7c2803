"""AQE runtime skew-join handling — the no-code-change complement to the
manual salting operator (link/alias.salted_count, oracle q23). A hot key
holding most rows must get its partition split at runtime."""

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # shrink thresholds so test-sized data triggers the optimization
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    prev = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 200k rows on ONE hot key + a uniform tail vs a small dim table
        facts = spark.range(220_000).select(
            F.when(F.col("id") < 200_000, F.lit(7))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            (F.col("id") * 2).alias("v"),
        )
        dim = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        joined = facts.join(dim, "k")
        # collect() executes THIS DataFrame's QueryExecution (count() builds
        # a derived plan, leaving this one unfinalized)
        rows = joined.collect()
        assert len(rows) == 220_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in prev.items():
            if v is not None:
                spark.conf.set(k, v)
            else:
                spark.conf.unset(k)


def test_skew_report_flags_hot_key(spark):
    from spanluke_spark.link.alias import skew_report

    rows = [(1, i) for i in range(900)] + [(k, 0) for k in range(2, 102)]
    df = spark.createDataFrame(rows, "key long, payload long")
    rep = {r["key"]: r for r in skew_report(df, ["key"], top_n=3).collect()}
    assert rep["1"]["n"] == 900
    stats = rep["__stats__"]
    assert stats["n"] == 1000
    # 101 keys, avg ~9.9, max 900 -> ratio ~90.9
    assert 85 < stats["skew_ratio"] < 95
    assert len(rep) == 4  # top 3 + stats
