"""PII redaction, repetition features, URL normalization — Python-oracle
parity and edge cases."""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F

from spanluke_spark.textops.pii import PII_PATTERNS, redact_pii
from spanluke_spark.textops.quality import repetition_features
from spanluke_spark.textops.urls import host_stats, normalize_urls


def _py_redact(text: str) -> tuple[str, dict[str, int]]:
    counts = {}
    out = text
    for name, pat, repl in PII_PATTERNS:
        # progressive: pattern i counted AFTER replacements 0..i-1, matching
        # redact_pii — overlapping matches are not double-counted.
        counts[name] = len(re.findall(pat, out))
        out = re.sub(pat, repl, out)
    return out, counts


def test_redact_pii_matches_python_oracle(spark):
    rows = [
        (1, "mail a.b+c@sub.example.co.uk now"),
        (2, "call 555-123-4567 or 800-555-0100."),
        (3, "server at 192.168.0.1 and 10.0.200.1;"),
        (4, "mixed: x@y.org 555-000-1111 1.2.3.4 x@y.org"),
        (5, "clean text with no pii at all"),
        (6, "<EMAIL> already redacted stays put"),
        (7, "not-an-ip 1.2.3 and short 55-123-4567"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    for doc_id, text in rows:
        exp_text, exp_counts = _py_redact(text)
        r = got[doc_id]
        assert r["text_redacted"] == exp_text, doc_id
        for name in ("email", "phone", "ipv4"):
            assert r[f"n_{name}"] == exp_counts[name], (doc_id, name)
        assert r["n_pii"] == sum(exp_counts.values())


def test_redact_pii_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "x@y.com 555-123-4567 9.9.9.9")], "doc_id long, text string"
    )
    once = redact_pii(df).select(F.col("text_redacted").alias("text"))
    twice = redact_pii(once).collect()[0]
    assert twice["text_redacted"] == twice["text"]
    assert twice["n_pii"] == 0


def _py_repetition(text: str) -> dict:
    words = text.split(" ")
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    wc, bc = Counter(words), Counter(bigrams)
    return {
        "n_words": len(words),
        "n_distinct_words": len(wc),
        "top_word_count": max(wc.values()),
        "n_bigrams": len(bigrams),
        "top_bigram_count": max(bc.values()) if bc else 0,
    }


def test_repetition_features_matches_python_oracle(spark):
    rows = [
        (1, "a b a c a"),
        (2, "x"),
        (3, "p q p q p q r"),
        (4, "same same same same"),
        (5, "all distinct words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in repetition_features(df).collect()}
    for doc_id, text in rows:
        exp = _py_repetition(text)
        r = got[doc_id]
        for k, v in exp.items():
            assert r[k] == v, (doc_id, k)
        assert abs(r["top_word_frac"] - exp["top_word_count"] / exp["n_words"]) < 1e-6
        if exp["n_bigrams"]:
            assert (
                abs(r["top_bigram_frac"] - exp["top_bigram_count"] / exp["n_bigrams"])
                < 1e-6
            )
        else:
            assert r["top_bigram_frac"] == 0.0


def test_repetition_features_no_shuffle(spark):
    df = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    plan = repetition_features(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_urls(spark):
    rows = [
        (1, "https://WWW.News.Example.org/a/b?q=1#frag"),
        (2, "http://example.com/"),
        (3, "https://sub.deep.host.co:8080/path"),
        (4, "https://localhost/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r["doc_id"]: r for r in normalize_urls(df).collect()}
    assert got[1]["host"] == "www.news.example.org"
    assert got[1]["path"] == "/a/b"
    assert got[1]["registered_domain"] == "example.org"
    assert got[1]["url_canonical"] == "https://www.news.example.org/a/b"
    assert got[2]["path"] == "/"
    assert got[3]["host"] == "sub.deep.host.co:8080"
    assert got[3]["registered_domain"] == "host.co:8080"
    assert got[4]["registered_domain"] == "localhost"


def test_host_stats(spark):
    rows = [
        (1, "https://a.x.org/1", "aaaa"),
        (2, "https://b.x.org/2", "bb"),
        (3, "https://a.x.org/3", "cccccc"),
        (4, "https://y.com/1", "dd"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = {r["registered_domain"]: r for r in host_stats(df).collect()}
    assert got["x.org"]["n_pages"] == 3
    assert got["x.org"]["n_hosts"] == 2
    assert got["x.org"]["sum_text_chars"] == 12
    assert abs(got["x.org"]["avg_text_chars"] - 4.0) < 1e-9
    assert got["y.com"]["n_pages"] == 1


def test_kmv_sketch_estimates_large_cardinalities(spark):
    """Exact below k; within ~3/sqrt(k) relative error above k."""
    from spanluke_spark.textops.sketch import kmv_distinct

    small = [("s", f"w{i % 40}") for i in range(500)]      # 40 distinct < k
    big = [("b", f"x{i}") for i in range(20000)]           # 20k distinct >> k
    df = spark.createDataFrame(small + big, "g string, w string")
    got = {r["g"]: r for r in kmv_distinct(df, "g", F.col("w"), k=64).collect()}
    assert got["s"]["kmv_estimate"] == 40.0                # exact branch
    est = got["b"]["kmv_estimate"]
    assert abs(est - 20000) / 20000 < 3 / (64 ** 0.5), est # ~<38% rel err
    # determinism
    again = {r["g"]: r["kmv_estimate"] for r in kmv_distinct(df, "g", F.col("w"), k=64).collect()}
    assert again == {g: r["kmv_estimate"] for g, r in got.items()}
