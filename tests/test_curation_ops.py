"""Survivor-selection dedup, deterministic sampling/splits, sequence packing."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import dedup_keep
from spanluke_spark.textops.packing import pack_sequences, pack_stats, with_shards
from spanluke_spark.textops.sampling import hash_split, stratified_sample


def test_dedup_keep_survivors(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 11)], "doc_id long, text string"
    )
    # clusters: {1,2,3} (chain), {5,9}; 4,6,7,8,10 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 9)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup_keep(docs, pairs).collect())
    assert kept == [1, 4, 5, 6, 7, 8, 10]


def test_dedup_keep_empty_pairs(spark):
    docs = spark.createDataFrame([(1, "a"), (2, "b")], "doc_id long, text string")
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dedup_keep(docs, pairs).count() == 2


def test_stratified_sample_deterministic_and_strata(spark):
    docs = spark.createDataFrame(
        [(i, "en" if i % 2 == 0 else "de") for i in range(1000)],
        "doc_id long, lang string",
    )
    rates = {"en": 0.5, "de": 0.0}
    a = sorted(r["doc_id"] for r in stratified_sample(docs, rates).collect())
    b = sorted(r["doc_id"] for r in stratified_sample(docs, rates).collect())
    assert a == b, "sample must be reproducible"
    langs = {r["lang"] for r in stratified_sample(docs, rates).collect()}
    assert langs == {"en"}
    # rate is approximate but should be in a generous binomial window
    assert 150 < len(a) < 350


def test_stratified_sample_salt_changes_sample(spark):
    docs = spark.createDataFrame(
        [(i, "en") for i in range(500)], "doc_id long, lang string"
    )
    a = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.5}, salt="s1").collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, {"en": 0.5}, salt="s2").collect()}
    assert a != b


def test_hash_split_disjoint_exhaustive(spark):
    docs = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    # reproducible assignment
    out2 = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.orderBy("doc_id").collect() == out2.orderBy("doc_id").collect()


def test_hash_split_rejects_bad_weights(spark):
    docs = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.6})


def _py_pack(rows: list[tuple[int, str]], budget: int) -> dict[int, int]:
    """Chunked-packer oracle: seq = floor(cum_tokens_before / budget)."""
    out, cum = {}, 0
    for doc_id, text in sorted(rows):
        out[doc_id] = cum // budget
        cum += len(text.split())
    return out


def test_pack_sequences_matches_python_oracle(spark):
    rows = [(i, " ".join(["w"] * (3 + i % 7))) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["seq_id"]
        for r in pack_sequences(df, budget=20, part_cols=[]).collect()
    }
    assert got == _py_pack(rows, 20)


def test_pack_sequences_oversized_doc_own_sequence(spark):
    rows = [(1, "a b c"), (2, " ".join(["x"] * 100)), (3, "d e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["seq_id"] for r in pack_sequences(df, 10, part_cols=[]).collect()}
    assert got[1] == 0 and got[2] == 0 and got[3] == 10  # 103 tokens before doc 3


def test_pack_stats_and_shards(spark):
    rows = [(i, "en" if i % 3 else "de", " ".join(["w"] * 10)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    packed = pack_sequences(with_shards(df, 4), budget=50, part_cols=["lang", "shard"])
    stats = pack_stats(packed, ["lang", "shard"]).collect()
    assert sum(r["n_docs"] for r in stats) == 200
    assert sum(r["sum_tokens"] for r in stats) == 2000
    # every shard id within range, all full sequences hold budget//10 docs
    assert all(0 <= r["shard"] < 4 for r in stats)
    by_key = {}
    for r in stats:
        by_key.setdefault((r["lang"], r["shard"]), []).append(r)
    for (lang, shard), seqs in by_key.items():
        max_seq = max(r["seq_id"] for r in seqs)
        for r in seqs:
            if r["seq_id"] < max_seq:  # full sequences
                assert r["sum_tokens"] == 50
