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
