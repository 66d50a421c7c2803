"""Streaming near-dup dedup (foreachBatch + signature index): the stream's
kept set equals the one-shot batch survivors, and an epoch replay is
idempotent."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import dedup_keep
from spanluke_spark.dedup.incremental import estimated_pairs, signature_index
from spanluke_spark.streaming.stream import make_incremental_dedup_processor


def _docs(spark):
    """Dup clusters are exact-copy cliques (the incremental==batch contract
    territory); non-dup docs share NO shingles with anything else."""
    rows = []
    for i in range(60):
        leader = i - (i % 5)
        if i % 5 < 3:
            text = f"g{leader}a g{leader}b g{leader}c g{leader}d g{leader}e " * 3
        else:
            text = " ".join(f"u{i}w{j}" for j in range(12))
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_survivors(docs):
    sig = signature_index(docs)
    pairs = estimated_pairs(sig, sig, threshold=0.5)
    return sorted(
        r["doc_id"] for r in dedup_keep(docs, pairs.select("id_a", "id_b")).collect()
    )


def test_stream_equals_batch_and_replay_idempotent(spark):
    docs = _docs(spark)
    out = tempfile.mkdtemp(prefix="sinc_")
    try:
        proc = make_incremental_dedup_processor(out, threshold=0.5)
        batches = [
            docs.filter(F.col("doc_id") < 20),
            docs.filter((F.col("doc_id") >= 20) & (F.col("doc_id") < 40)),
            docs.filter(F.col("doc_id") >= 40),
        ]
        for epoch, b in enumerate(batches):
            proc(b, epoch)

        kept_path = os.path.join(out, "kept")
        got = sorted(r["doc_id"] for r in spark.read.parquet(kept_path).collect())
        assert got == _batch_survivors(docs)

        # replay epoch 1 (crash between write and checkpoint commit)
        before = sorted(map(tuple, spark.read.parquet(kept_path).collect()))
        proc(batches[1], 1)
        after = sorted(map(tuple, spark.read.parquet(kept_path).collect()))
        assert after == before
        idx = spark.read.parquet(os.path.join(out, "sig_index"))
        assert sorted(r["id"] for r in idx.select("id").collect()) == got
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_recrawl_upsert_updates_index(spark):
    """A re-crawled id whose CHANGED text survives dedup must land its NEW
    signature in the index (the old delta rule anti-joined on prior ids and
    silently kept the stale signature — then near-copies of the new text
    slipped past dedup forever)."""
    import tempfile

    from spanluke_spark.streaming.stream import read_signature_index

    text_a = "alpha beta gamma delta epsilon zeta " * 3
    text_b = "one two three four five six seven eight " * 3
    out = tempfile.mkdtemp(prefix="sinc_up_")
    try:
        proc = make_incremental_dedup_processor(out, threshold=0.5)
        # epoch 0: doc 5 with text A
        proc(spark.createDataFrame([(5, text_a)], "doc_id long, text string"), 0)
        # epoch 1: doc 5 re-crawled with UNRELATED text B -> survives, upserts
        proc(spark.createDataFrame([(5, text_b)], "doc_id long, text string"), 1)
        idx = read_signature_index(spark, os.path.join(out, "sig_index"))
        assert idx.count() == 1  # one signature per id, the latest
        want = signature_index(
            spark.createDataFrame([(5, text_b)], "doc_id long, text string")
        )
        assert sorted(map(tuple, idx.collect())) == sorted(map(tuple, want.collect()))
        # epoch 2: near-copy of text B under a NEW id -> must now be dropped
        proc(spark.createDataFrame([(9, text_b)], "doc_id long, text string"), 2)
        kept = spark.read.parquet(os.path.join(out, "kept"))
        assert kept.filter(F.col("doc_id") == 9).count() == 0
        # and the replay contract still holds for the upserting epoch
        proc(spark.createDataFrame([(5, text_b)], "doc_id long, text string"), 1)
        idx2 = read_signature_index(spark, os.path.join(out, "sig_index"))
        assert sorted(map(tuple, idx2.collect())) == sorted(map(tuple, want.collect()))
    finally:
        shutil.rmtree(out, ignore_errors=True)
