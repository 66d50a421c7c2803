"""LSH-vs-exact recall audit: planted near-dups are found, weak bandings
measurably lose recall, and counts reconcile."""

from __future__ import annotations

from spanluke_spark.evaluation.dedup_eval import lsh_recall_report


def _corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = []
    for i in range(20):
        rows.append((i, f"{base} variant {i} " + " ".join(f"w{i}{j}" for j in range(8))))
    # planted near-identical pairs (one-word edits of each other)
    rows.append((100, base + " exact copy marker one two three four five six"))
    rows.append((101, base + " exact copy marker one two three four five SIX"))
    rows.append((102, base + " exact copy marker one two three four five six"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_pairs_recalled(spark):
    r = lsh_recall_report(_corpus(spark), t_num=3, t_den=5).collect()[0]
    assert r.n_true >= 3  # the planted trio
    assert r.n_hit == r.n_true and r.recall == 1.0
    assert r.n_candidates >= r.n_hit
    assert 0.0 < r.precision <= 1.0


def test_weak_banding_reduces_recall_or_candidates(spark):
    strong = lsh_recall_report(
        _corpus(spark), num_hashes=32, bands=8
    ).collect()[0]
    # 2 bands x 16 rows: a band only fires on near-identical signatures
    weak = lsh_recall_report(
        _corpus(spark), num_hashes=32, bands=2
    ).collect()[0]
    assert weak.n_candidates <= strong.n_candidates
    assert weak.recall <= strong.recall
