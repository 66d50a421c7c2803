"""SURT key derivation edge cases and CDX row contract."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spanluke_spark.etl.cdx import build_cdx, surt_key


def _keys(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]


def test_surt_canonical_forms(spark):
    got = _keys(
        spark,
        [
            "http://www.Example.com/A/b?x=1",
            "https://example.com:443/A/b?x=1",
            "HTTPS://EXAMPLE.COM/A/b?x=1#sec2",
            "https://news.sub.example.co.uk/",
            "http://example.com",
            "http://example.com:8080/p",
        ],
    )
    assert got[0] == "com,example)/a/b?x=1"
    assert got[1] == "com,example)/a/b?x=1"  # default port stripped
    assert got[2] == "com,example)/a/b?x=1"  # fragment dropped
    assert got[3] == "uk,co,example,sub,news)/"
    assert got[4] == "com,example)/"  # bare host gets root path
    assert got[5] == "com,example:8080)/p"  # non-default port preserved


def test_same_host_clusters_contiguously(spark):
    keys = sorted(
        _keys(
            spark,
            [
                "https://a.example.com/1",
                "https://zz-other.org/x",
                "https://b.example.com/2",
                "https://example.com/3",
            ],
        )
    )
    # all example.com captures sort adjacent, subdomains included
    ex = [k for k in keys if k.startswith("com,example")]
    i = keys.index(ex[0])
    assert keys[i : i + len(ex)] == ex and len(ex) == 3


def test_cdx_row_digest_and_length(spark):
    pages = spark.createDataFrame(
        [("https://example.com/p", 20240101000000, "<html>hi</html>")],
        "url string, warc_ts long, html string",
    )
    r = build_cdx(pages).collect()[0]
    assert r.surt_key == "com,example)/p"
    assert r.ts == 20240101000000
    assert r.digest == hashlib.sha256(b"<html>hi</html>").hexdigest()
    assert r.length == len("<html>hi</html>")
