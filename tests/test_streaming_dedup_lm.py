"""Streaming bounded-state dedup and unigram-LM quality scoring."""

from __future__ import annotations

import math
import os
import shutil
import tempfile
from collections import Counter

from pyspark.sql import functions as F

from spanluke_spark.streaming.stream import streaming_dedup
from spanluke_spark.textops.lm_score import unigram_lm_scores

PAGE_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def _page_rows(spark, rows):
    return spark.createDataFrame(
        [
            (u, t, None, txt, "en")
            for u, t, txt in rows
        ],
        "url string, warc_ts string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def test_streaming_dedup_across_microbatches(spark):
    tmp = tempfile.mkdtemp(prefix="sdedup_")
    try:
        # batch 1: docs a..e; batch 2: re-crawls of a,b (+1 min) and new f,g
        _page_rows(
            spark,
            [(f"u{i}", f"2024-01-01 00:0{i}:00", f"doc {i}") for i in range(5)],
        ).write.parquet(os.path.join(tmp, "in"), mode="append")
        _page_rows(
            spark,
            [(f"u{i}r", f"2024-01-01 00:1{i}:00", f"doc {i}") for i in range(2)]
            + [(f"u{i}", f"2024-01-01 00:2{i % 10}:00", f"doc {i}") for i in (5, 6)],
        ).write.parquet(os.path.join(tmp, "in"), mode="append")

        stream = (
            spark.readStream.schema(PAGE_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(tmp, "in"))
        )
        deduped = streaming_dedup(stream, watermark="1 hour")
        q = (
            deduped.select("text")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("sdedup_out")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = sorted(r["text"] for r in spark.table("sdedup_out").collect())
        assert got == [f"doc {i}" for i in range(7)], got
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_unigram_lm_scores_matches_python_oracle(spark):
    rows = [(1, "a b a c"), (2, "a a a a"), (3, "rare words only here"), (4, "b c b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}

    words = [w for _, t in rows for w in t.split(" ")]
    vocab = Counter(words)
    total, v, k = len(words), len(vocab), 0.5
    denom = total + k * (v + 1)

    for doc_id, text in rows:
        toks = text.split(" ")
        exp = sum(-math.log2((vocab[w] + k) / denom) for w in toks) / len(toks)
        assert got[doc_id]["n_tokens"] == len(toks)
        assert abs(got[doc_id]["bits_per_token"] - exp) < 1e-5, doc_id


def test_unigram_lm_scores_ranks_gibberish_high(spark):
    common = [(i, "the cat sat on the mat") for i in range(20)]
    df = spark.createDataFrame(
        common + [(100, "zxqv wkjh pqrs tuvw xyzz ab")], "doc_id long, text string"
    )
    scores = {r["doc_id"]: r["bits_per_token"] for r in unigram_lm_scores(df).collect()}
    assert scores[100] > scores[0]


def test_unigram_lm_plan_is_broadcast(spark):
    df = spark.createDataFrame([(1, "a b"), (2, "b c")], "doc_id long, text string")
    plan = unigram_lm_scores(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_lm_backoff_python_oracle(spark):
    """Train on one corpus, score ANOTHER -> the stupid-backoff branch and
    unseen-word smoothing genuinely fire; verify against a Python replay."""
    import math
    from collections import Counter

    from spanluke_spark.textops.lm_score import bigram_lm_scores

    train_rows = [(1, "the cat sat on the mat"), (2, "the dog sat"), (3, "a cat ran")]
    score_rows = [(10, "the cat ran"), (11, "zebra the cat"), (12, "solo")]
    k, alpha = 0.5, 0.4

    uni = Counter(w for _, t in train_rows for w in t.split())
    big = Counter()
    for _, t in train_rows:
        ws = t.split()
        for i in range(1, len(ws)):
            big[(ws[i - 1], ws[i])] += 1
    ctx = Counter()
    for (a, _), c in big.items():
        ctx[a] += c
    total, v = sum(uni.values()), len(uni)

    def p_uni_bits(w):
        return -math.log2((uni.get(w, 0) + k) / (total + k * (v + 1)))

    def doc_score(text):
        ws = text.split()
        bits = [p_uni_bits(ws[0])]
        for i in range(1, len(ws)):
            pair = (ws[i - 1], ws[i])
            if pair in big:
                bits.append(-math.log2(big[pair] / ctx[ws[i - 1]]))
            else:
                bits.append(-math.log2(alpha) + p_uni_bits(ws[i]))
        return len(ws), round(sum(bits) / len(bits), 6)

    train = spark.createDataFrame(train_rows, "doc_id long, text string")
    score = spark.createDataFrame(score_rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bits_per_token"])
        for r in bigram_lm_scores(score, train_df=train).collect()
    }
    assert got == {d: doc_score(t) for d, t in score_rows}
    # "the cat" is a seen bigram; "zebra" is unseen (smoothing) and
    # ("zebra","the") backs off -> doc 11 must cost more bits than doc 10
    assert got[11][1] > got[10][1]
