"""Monster-page robustness: at crawl scale a handful of pages are 100-1000x
the median size. The extraction kernels must stay linear on them (trie walk
+ adjacent merge, no O(n*max_len) surface joins) and one giant row must not
break Arrow batching when mixed into a normal partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.etl.bpe import bpe_token_count
from spanluke_spark.fixtures import PIPELINE_GAZETTEER
from spanluke_spark.pipeline import extract_mentions_span, extract_mentions_token


def _docs(spark):
    # 200k-word page with two planted entities, among 50 normal pages
    giant = (
        " ".join(f"w{i % 997}" for i in range(100_000))
        + " spark cluster "
        + " ".join(f"v{i % 89}" for i in range(100_000))
        + " parquet file"
    )
    rows = [(0, giant)] + [(i, f"normal doc {i} mentions spark here") for i in range(1, 51)]
    return spark.createDataFrame(rows, "doc_id long, text string").repartition(4)


def test_token_path_giant_doc(spark):
    got = extract_mentions_token(_docs(spark), ["doc_id"], PIPELINE_GAZETTEER)
    giant_mentions = [
        (r["surface"], r["label"])
        for r in got.filter(F.col("doc_id") == 0).collect()
    ]
    assert len(giant_mentions) >= 1  # planted entities found in the monster page
    assert got.filter(F.col("doc_id") > 0).count() >= 50


def test_span_path_giant_doc(spark):
    got = extract_mentions_span(_docs(spark), ["doc_id"], PIPELINE_GAZETTEER)
    assert got.filter(F.col("doc_id") == 0).count() >= 1
    assert got.filter(F.col("doc_id") > 0).count() >= 50


def test_bpe_count_giant_doc(spark):
    out = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(_docs(spark)).collect()
    }
    # ~200k words + separators; exact value checked cheap: > token lower bound
    assert out[0] > 200_000
    assert all(v > 0 for k, v in out.items() if k > 0)
