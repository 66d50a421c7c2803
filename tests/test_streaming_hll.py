"""Streaming HLL — the register relation through Spark's NATIVE
streaming max-agg across real micro-batches must equal the batch sketch
bit-for-bit (registers AND estimates), including when items repeat
across batches."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from spanluke_spark.textops.sketch import (
    hll_distinct,
    hll_estimate_from_registers,
    hll_registers,
)


def _run_stream(spark, rows, n_files=4):
    df = spark.createDataFrame(rows, "g: string, w: string")
    tmp = tempfile.mkdtemp(prefix="hll_stream_")
    df.repartition(n_files).write.mode("overwrite").parquet(tmp)
    stream = (
        spark.readStream.schema("g string, w string")
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
    )
    import os

    name = "hll_regs_" + os.path.basename(tmp).rsplit("_", 1)[-1]
    q = (
        hll_registers(stream, "g", F.col("w"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    return spark.table(name), df, n_batches


def test_stream_equals_batch_bit_for_bit(spark):
    rows = [("a", f"w{i % 300}") for i in range(900)] + [
        ("b", f"x{i}") for i in range(40)
    ]
    regs_stream, df, n_batches = _run_stream(spark, rows)
    assert n_batches >= 2  # a real multi-batch run, not one gulp
    got = {
        (r["g"], r["n_regs"], r["hll_estimate"])
        for r in hll_estimate_from_registers(regs_stream, "g").collect()
    }
    want = {
        (r["g"], r["n_regs"], r["hll_estimate"])
        for r in hll_distinct(df, "g", F.col("w")).collect()
    }
    assert got == want
    # register-level identity too, not just estimates
    sr = {
        (r["g"], r["bucket"], r["mrho"]) for r in regs_stream.collect()
    }
    br = {
        (r["g"], r["bucket"], r["mrho"])
        for r in hll_registers(df, "g", F.col("w")).collect()
    }
    assert sr == br


def test_cross_batch_duplicates_do_not_inflate(spark):
    # the same 50 items in every file: state must not grow across batches
    rows = [("g", f"tok{i}") for i in range(50)] * 4
    regs_stream, df, _ = _run_stream(spark, rows, n_files=4)
    est = hll_estimate_from_registers(regs_stream, "g").collect()[0]
    batch = hll_distinct(df, "g", F.col("w")).collect()[0]
    assert (est["n_regs"], est["hll_estimate"]) == (
        batch["n_regs"],
        batch["hll_estimate"],
    )
    assert abs(est["hll_estimate"] - 50) < 12
