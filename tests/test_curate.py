"""One-call curation pipeline: composition semantics + null tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from spanluke_spark.textops.curate import curate


def _docs(spark):
    # en docs: 3 exact-ish near-dups (differ by one word), 2 unique;
    # de doc passes; fr doc filtered by lang; short doc filtered by length
    base = "alpha beta gamma delta epsilon zeta eta theta " * 4  # 32 tokens
    rows = [
        (1, base + "one", "en"),
        (2, base + "one", "en"),          # exact dup of 1
        (3, base + "two", "en"),          # near-dup of 1/2
        (4, "totally different words " * 8, "en"),
        (5, "another unique document body " * 8, "en"),
        (6, "ganz anderes deutsches dokument mit eigenem inhalt " * 5, "de"),
        (7, base + "fr", "fr"),           # lang-filtered
        (8, "too short", "en"),           # length-filtered
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_curate_filters_dedups_and_keeps_min_id(spark):
    out = curate(
        _docs(spark),
        min_tokens=20,
        langs=["en", "de"],
        dedup_threshold=0.5,
        sample_rates=None,
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 7 (lang) and 8 (length) gone; of the near-dup cluster {1,2,3} only 1 survives
    assert 1 in kept and 2 not in kept and 3 not in kept
    assert kept == [1, 4, 5, 6]


def test_curate_sampling_is_subset_and_deterministic(spark):
    full = curate(
        _docs(spark), min_tokens=20, langs=["en", "de"], dedup_threshold=0.5,
        sample_rates=None,
    )
    sampled = curate(
        _docs(spark), min_tokens=20, langs=["en", "de"], dedup_threshold=0.5,
        sample_rates={"en": 0.5, "de": 1.0}, salt="t",
    )
    full_ids = {r["doc_id"] for r in full.collect()}
    s1 = {r["doc_id"] for r in sampled.collect()}
    s2 = {r["doc_id"] for r in sampled.collect()}
    assert s1 == s2
    assert s1 <= full_ids
    assert 6 in s1  # de rate 1.0 keeps the de survivor


def test_curate_no_dedup_no_sample_is_pure_filter(spark):
    out = curate(_docs(spark), min_tokens=20, langs=["en"], dedup_threshold=None)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 3, 4, 5]


def test_textops_tolerate_null_text(spark):
    from spanluke_spark.textops.pii import redact_pii
    from spanluke_spark.textops.quality import filter_quality, repetition_features

    df = spark.createDataFrame(
        [(1, None, "en"), (2, "ok text here and long enough " * 3, "en")],
        "doc_id long, text string, lang string",
    )
    # none of these may raise; null rows produce null features / get filtered
    assert redact_pii(df).count() == 2
    assert repetition_features(df).count() == 2
    kept = [r["doc_id"] for r in filter_quality(df, min_tokens=5).collect()]
    assert kept == [2]
