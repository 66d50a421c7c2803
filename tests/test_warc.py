"""WARC ingestion (etl/warc.py): record parse, per-record-gzip members,
HTTP framing strip, and WARC -> pages -> KG-extraction integration."""

from __future__ import annotations

import gzip
import os
import shutil
import tempfile
from datetime import datetime, timezone

import pytest

from spanluke_spark.etl.warc import (
    read_wet,
    encode_warc,
    gunzip_members,
    parse_warc,
    read_warc,
)


def _records(n=4):
    return [
        (
            f"https://example.org/doc/{i}",
            datetime(2024, 3, 1, 12, i, 0, tzinfo=timezone.utc),
            f"<html><body><p>page {i} body text</p></body></html>".encode(),
        )
        for i in range(n)
    ]


def test_roundtrip_plain_and_gzip():
    recs = _records()
    for gz in (False, True):
        got = list(parse_warc(encode_warc(recs, gzip_per_record=gz)))
        assert len(got) == len(recs), gz  # warcinfo member skipped
        for rec, (url, ts, html) in zip(got, recs):
            assert rec["url"] == url
            assert rec["warc_ts"] == ts
            assert bytes(rec["html"]) == html  # HTTP framing stripped


def test_gunzip_members_reads_all_members():
    """Pins the multi-member behavior the Common-Crawl layout depends on:
    if a future runtime's decompress stopped at the first member, records
    2..n would be silently lost — this would catch it."""
    parts = [b"alpha-", b"beta-", b"gamma"]
    multi = b"".join(gzip.compress(p) for p in parts)
    assert gunzip_members(multi) == b"".join(parts)
    with pytest.raises(ValueError, match="gzip"):
        gunzip_members(b"\x1f\x8bnot really gzip at all")


def test_malformed_warc_raises():
    good = encode_warc(_records(2))
    # cut inside the LAST record's body: definitely torn, not a clean prefix
    with pytest.raises(ValueError, match="truncated|not a WARC|Content-Length"):
        list(parse_warc(good[:-12]))
    with pytest.raises(ValueError):
        list(parse_warc(b"GARBAGE/1.0\r\n\r\n\r\n\r\n"))


def test_read_warc_to_pages_and_extraction(spark):
    """End-to-end: .warc.gz files -> pages rows -> the real extraction
    kernel (html -> text -> mentions) — the authentic Common-Crawl first
    mile feeding the existing pipeline unchanged."""
    from pyspark.sql import functions as F

    from spanluke_spark.etl.extract import extract_text

    out = tempfile.mkdtemp(prefix="warc_")
    try:
        recs = _records(6)
        with open(os.path.join(out, "seg0.warc.gz"), "wb") as f:
            f.write(encode_warc(recs[:3], gzip_per_record=True))
        with open(os.path.join(out, "seg1.warc"), "wb") as f:
            f.write(encode_warc(recs[3:]))
        pages = read_warc(spark, out, lang="en")
        rows = {r.url: r for r in pages.collect()}
        assert len(rows) == 6
        for url, ts, html in recs:
            assert bytes(rows[url].html) == html
            assert rows[url].warc_ts == ts.replace(tzinfo=None)  # session-local naive
            assert rows[url].lang == "en"
        # the standard downstream hop works unchanged on WARC-read pages
        extracted = extract_text(pages)
        texts = {r.url: r.text for r in extracted.collect()}
        for i, (url, _, _) in enumerate(recs):
            assert texts[url] == f"page {i} body text"
        # one file per task: exactly 2 input partitions for 2 files
        assert pages.rdd.getNumPartitions() <= 4
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_read_wet_conversion_records(spark):
    """WET path: conversion records yield text directly (no HTTP framing),
    html NULL — and response-only parsing still skips them."""

    out = tempfile.mkdtemp(prefix="wet_")
    try:
        texts = [f"extracted text for page {i}\nsecond line" for i in range(3)]
        # hand-build conversion records (encode_warc writes responses)
        buf = bytearray()
        for i, t in enumerate(texts):
            body = t.encode()
            buf += (
                "WARC/1.0\r\nWARC-Type: conversion\r\n"
                f"WARC-Target-URI: https://example.org/w{i}\r\n"
                "WARC-Date: 2024-06-01T00:00:00Z\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode() + body + b"\r\n\r\n"
        with open(os.path.join(out, "seg.warc.wet.gz"), "wb") as f:
            f.write(gzip.compress(bytes(buf)))
        rows = {r.url: r for r in read_wet(spark, out, lang="en").collect()}
        assert len(rows) == 3
        for i, t in enumerate(texts):
            r = rows[f"https://example.org/w{i}"]
            assert r.text == t and r.html is None and r.lang == "en"
        # response-mode parser skips conversion records entirely
        assert list(parse_warc(bytes(buf))) == []
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_read_warc_salvage_policy(spark):
    """One torn crawl file must not kill the ingest: salvage keeps records
    parsed before the corruption point plus a countable marker row; the
    strict default still fails."""
    out = tempfile.mkdtemp(prefix="warc_salvage_")
    try:
        good = encode_warc(_records(3))
        torn = encode_warc(_records(2))[:-12]  # cut inside the last body
        with open(os.path.join(out, "ok.warc"), "wb") as f:
            f.write(good)
        with open(os.path.join(out, "torn.warc"), "wb") as f:
            f.write(torn)
        rows = read_warc(spark, out, lang="en", on_error="salvage").collect()
        markers = [r for r in rows if r.url.startswith("warc:corrupt:")]
        pages = [r for r in rows if not r.url.startswith("warc:corrupt:")]
        assert len(markers) == 1 and markers[0].html is None
        # 3 from the good file + record 0 of the torn file (record 1 is torn)
        assert len(pages) == 4
        assert sum(1 for r in pages if r.html is not None) == 4
        with pytest.raises(Exception):
            read_warc(spark, out, lang="en").collect()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_warc11_fractional_second_dates():
    """WARC 1.1 permits fractional seconds; both forms must parse (not NULL)."""
    from datetime import datetime, timezone

    from spanluke_spark.etl.warc import _parse_warc_date

    assert _parse_warc_date("2024-03-01T12:00:00Z") == datetime(
        2024, 3, 1, 12, 0, 0, tzinfo=timezone.utc
    )
    assert _parse_warc_date("2024-03-01T12:00:00.123Z") == datetime(
        2024, 3, 1, 12, 0, 0, 123000, tzinfo=timezone.utc
    )
    assert _parse_warc_date("2024-03-01T12:00:00.123456Z") == datetime(
        2024, 3, 1, 12, 0, 0, 123456, tzinfo=timezone.utc
    )
    assert _parse_warc_date("not a date") is None
    assert _parse_warc_date("2024-03-01 12:00:00") is None
