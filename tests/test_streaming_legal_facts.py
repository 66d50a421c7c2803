"""Streaming legal-facts extraction (streaming/stream.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.etl.legalfacts import legal_facts
from spanluke_spark.streaming.stream import (
    make_legal_facts_processor,
    read_page_stream,
    streaming_legal_facts,
)

_DOC = (
    "CORAM: HON'BLE MR. JUSTICE D.Y. CHANDRACHUD. "
    "he was convicted u/s 302/34 IPC. order dated 25.03.2004."
)


def _write_pages(spark, path, n=30):
    spark.createDataFrame(
        [
            (f"https://h/{i}", None, None, _DOC, "en")
            for i in range(n)
        ],
        "url string, warc_ts timestamp, html binary, text string, lang string",
    ).repartition(3).write.parquet(path)


def test_stream_matches_batch(spark, tmp_path):
    pages_dir = str(tmp_path / "pages")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_pages(spark, pages_dir)

    stream = read_page_stream(spark, pages_dir)
    q = streaming_legal_facts(stream, out_dir, checkpoint_dir=ckpt).start()
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir + "/facts")
    batch = legal_facts(
        spark.read.parquet(pages_dir), text_col="text", id_col="url"
    )
    assert got.count() == batch.count() == 30 * 4
    g = {
        (r.url, r.pred, r.obj)
        for r in got.select("url", "pred", "obj").collect()
    }
    b = {
        (r.url, r.pred, r.obj)
        for r in batch.collect()
    }
    assert g == b


def test_epoch_replay_idempotent(spark, tmp_path):
    out_dir = str(tmp_path / "out")
    batch = spark.createDataFrame(
        [(f"https://h/{i}", _DOC) for i in range(8)], "url string, text string"
    )
    proc = make_legal_facts_processor(out_dir, n_buckets=4)
    proc(batch, epoch_id=0)
    n1 = spark.read.parquet(out_dir + "/facts").count()
    # replayed epoch (failure between write and checkpoint commit)
    proc(batch, epoch_id=0)
    n2 = spark.read.parquet(out_dir + "/facts").count()
    assert n1 == n2 == 8 * 4
    # a new epoch appends its own partitions only
    proc(batch.withColumn("url", F.concat(F.lit("x"), "url")), epoch_id=1)
    assert spark.read.parquet(out_dir + "/facts").count() == 2 * 8 * 4
