"""Incremental dedup == one-shot batch dedup when ids follow arrival order."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from spanluke_spark.dedup.dedup import dedup_keep
from spanluke_spark.dedup.incremental import (
    estimated_pairs,
    incremental_dedup,
    signature_index,
)


def _corpus(spark, n_docs=200, seed=5):
    """Repetitive vocab -> natural near-dups; every 7th doc is an exact copy
    of its group leader, so duplicate clusters definitely span run splits."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    texts = {}
    rows = []
    for i in range(n_docs):
        leader = i - (i % 7)
        if i % 7 != 0 and leader in texts and rng.random() < 0.6:
            text = texts[leader]  # exact duplicate of leader
        else:
            text = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 25)))
        texts[i] = text
        rows.append((i, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _batch_survivors(docs):
    sig = signature_index(docs)
    pairs = estimated_pairs(sig, sig, threshold=0.5)
    return sorted(
        r["doc_id"]
        for r in dedup_keep(
            docs, pairs.select("id_a", "id_b"), id_col="doc_id"
        ).collect()
    )


def _run_incremental(docs, splits):
    kept_all, index = [], None
    for lo, hi in splits:
        delta = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        kept, index = incremental_dedup(delta, index, threshold=0.5)
        kept_all.extend(r["doc_id"] for r in kept.collect())
    return sorted(kept_all), index


def test_incremental_two_runs_equals_batch(spark):
    docs = _corpus(spark)
    batch = _batch_survivors(docs)
    inc, index = _run_incremental(docs, [(0, 100), (100, 200)])
    assert inc == batch
    assert sorted(r["id"] for r in index.select("id").collect()) == batch


def test_incremental_three_runs_equals_batch(spark):
    docs = _corpus(spark, n_docs=150, seed=9)
    batch = _batch_survivors(docs)
    inc, _ = _run_incremental(docs, [(0, 50), (50, 100), (100, 150)])
    assert inc == batch


def test_incremental_short_docs_always_survive(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "x"), (4, "long enough doc " * 4)],
        "doc_id long, text string",
    )
    kept, index = incremental_dedup(docs, None, threshold=0.5)
    ids = sorted(r["doc_id"] for r in kept.collect())
    # 1, 2, 3 have <3 tokens -> no shingles -> no signature -> all kept
    assert ids == [1, 2, 3, 4]
    assert sorted(r["id"] for r in index.select("id").collect()) == [4]


def test_recrawl_same_id_hits_own_signature(spark):
    """A re-crawled doc re-ingested under its ORIGINAL id must collide with
    its own stored signature (est_jaccard 1.0): the duplicate is dropped and
    the index keeps exactly one signature per id."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    first = spark.createDataFrame([(10, text)], "doc_id long, text string")
    kept1, index = incremental_dedup(first, None, threshold=0.5)
    assert [r["doc_id"] for r in kept1.collect()] == [10]

    recrawl = spark.createDataFrame([(10, text)], "doc_id long, text string")
    kept2, index2 = incremental_dedup(recrawl, index, threshold=0.5)
    assert kept2.count() == 0
    assert [r["id"] for r in index2.select("id").collect()] == [10]


def test_recrawl_changed_text_replaces_index_signature(spark):
    """A re-crawled id whose text CHANGED enough to survive dedup replaces
    its stored signature (upsert) — the index never holds two rows for one
    id, and future deltas dedup against the NEW content."""
    old = "alpha beta gamma delta epsilon zeta eta theta"
    new = "one two three four five six seven eight nine ten"
    first = spark.createDataFrame([(10, old)], "doc_id long, text string")
    _, index = incremental_dedup(first, None, threshold=0.5)

    recrawl = spark.createDataFrame([(10, new)], "doc_id long, text string")
    kept, index2 = incremental_dedup(recrawl, index, threshold=0.5)
    assert [r["doc_id"] for r in kept.collect()] == [10]
    assert index2.filter(F.col("id") == 10).count() == 1

    # a later exact copy of the NEW text (different id) is now caught
    third = spark.createDataFrame([(11, new)], "doc_id long, text string")
    kept3, _ = incremental_dedup(third, index2, threshold=0.5)
    assert kept3.count() == 0
