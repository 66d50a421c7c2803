"""WARC ingestion: the authentic Common-Crawl on-disk format -> the pages
table of the north_rule (url, warc_ts, html, text, lang).

WARC (ISO 28500) is a plain record container: each record is a header block
(``WARC/1.0`` + name:value lines, CRLF-terminated) followed by
``Content-Length`` payload bytes and a blank-line separator. Common Crawl
writes ``.warc.gz`` with ONE GZIP MEMBER PER RECORD (so readers can seek);
``gunzip_members`` decompresses every member (delegating to stdlib
``gzip.decompress``, which walks members since Python 3.8, with an explicit
multi-member test pinning that behavior).

Scale shape: one WARC file = one task (the standard Common-Crawl processing
grain — files are ~1 GB and internally sequential). ``read_warc`` loads
files via the ``binaryFile`` source and parses inside ``mapInPandas``, so a
1000-executor cluster processes one crawl segment per core with zero
shuffles; the output lands directly in ``with_part_key``/``write_table``
(storage) for the bucketed pages table. The fixture-grade writer mirrors
``encode_bmp``/``encode_wav``: tests and local runs need no real crawl.
"""

from __future__ import annotations

import gzip
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def gunzip_members(payload: bytes) -> bytes:
    """Concatenate ALL gzip members (Common Crawl: one member per record).
    Stdlib ``gzip.decompress`` walks members on modern Python; corrupt
    streams surface as ValueError like every other decoder here."""
    try:
        return gzip.decompress(payload)
    except (OSError, EOFError, zlib.error) as exc:
        raise ValueError(f"corrupt gzip stream: {exc}") from exc


def _parse_warc_date(s: str) -> datetime | None:
    # WARC 1.0 mandates whole seconds; WARC 1.1 allows fractional seconds
    # (e.g. 2024-03-01T12:00:00.123Z) — accept both rather than silently
    # NULLing every 1.1 timestamp
    s = s.strip()
    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%dT%H:%M:%S.%fZ"):
        try:
            return datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
        except ValueError:
            continue
    return None


def parse_warc(buf: bytes, record_type: str = "response") -> Iterator[dict]:
    """Iterate records of one (decompressed) WARC buffer as dicts
    (url, warc_ts, html). ``record_type="response"`` strips HTTP framing
    (WARC files); ``"conversion"`` yields the payload verbatim (WET files —
    Common Crawl's pre-extracted text). Malformed trailing bytes raise
    ValueError — per-file corruption surfaces as one clean failure, not
    silent loss."""
    if buf[:2] == b"\x1f\x8b":
        buf = gunzip_members(buf)
    pos = 0
    n = len(buf)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and buf[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        while pos < n and buf[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        header = buf[pos:hdr_end].decode("utf-8", errors="replace")
        lines = header.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}: {lines[0][:40]!r}")
        fields = {}
        for line in lines[1:]:
            k, _, v = line.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC record without valid Content-Length") from exc
        body_start = hdr_end + 4
        body = buf[body_start : body_start + length]
        if len(body) < length:
            raise ValueError("truncated WARC record body")
        pos = body_start + length
        if fields.get("warc-type") != record_type:
            continue  # warcinfo / request / metadata records carry no page
        if record_type == "response":
            # response payload is an HTTP message: status line + headers,
            # blank line, entity body (the html bytes)
            sep = body.find(b"\r\n\r\n")
            payload = body[sep + 4 :] if sep >= 0 else body
        else:
            payload = body  # conversion (WET): the extracted text itself
        yield {
            "url": fields.get("warc-target-uri", ""),
            "warc_ts": _parse_warc_date(fields.get("warc-date", "")),
            "html": payload,
        }


def read_warc(
    spark: SparkSession,
    path: str,
    lang: str | None = None,
    on_error: str = "raise",
) -> DataFrame:
    """WARC files under ``path`` (.warc / .warc.gz) -> pages rows
    (url, warc_ts, html, text=NULL, lang). One file per task via the
    binaryFile source; parse + HTTP-strip inside mapInPandas, no shuffle —
    feed the result to ``extract_text``/``run_kg_pipeline`` unchanged.

    ``on_error``: ``"raise"`` (default) fails the task on the first corrupt
    file; ``"salvage"`` keeps every record parsed BEFORE the corruption
    point and quarantines the rest of that file as one marker row
    (url = ``warc:corrupt:<reason>``, html NULL) — the crawl policy: one
    torn segment must not kill a 10^12-page ingest, and the marker rows
    make the loss countable (``html IS NULL``)."""
    if on_error not in ("raise", "salvage"):
        raise ValueError(f"on_error must be 'raise' or 'salvage', got {on_error!r}")

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "warc_ts": [], "html": [], "text": [], "lang": []
            }

            def add(url, ts, html):
                rows["url"].append(url)
                rows["warc_ts"].append(ts)
                rows["html"].append(html)
                rows["text"].append(None)
                rows["lang"].append(lang)

            for content in pdf["content"]:
                try:
                    for rec in parse_warc(bytes(content)):
                        add(rec["url"], rec["warc_ts"], rec["html"])
                except ValueError as exc:
                    if on_error == "raise":
                        raise
                    add(f"warc:corrupt:{exc}", None, None)
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_parse, PAGES_SCHEMA)


def read_wet(spark: SparkSession, path: str, lang: str | None = None) -> DataFrame:
    """WET files (Common Crawl's pre-extracted text: ``conversion`` records)
    -> pages rows with ``text`` already filled and ``html`` NULL — the
    skip-extraction fast path for pipelines that trust the crawl's own
    extractor. Same one-file-per-task shape as ``read_warc``."""

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "warc_ts": [], "html": [], "text": [], "lang": []
            }
            for content in pdf["content"]:
                for rec in parse_warc(bytes(content), record_type="conversion"):
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(rec["warc_ts"])
                    rows["html"].append(None)
                    rows["text"].append(
                        bytes(rec["html"]).decode("utf-8", errors="replace")
                    )
                    rows["lang"].append(lang)
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(_parse, PAGES_SCHEMA)


def encode_warc(
    records: list[tuple[str, datetime, bytes]],
    gzip_per_record: bool = False,
) -> bytes:
    """Fixture-grade WARC writer: (url, ts, html) -> WARC bytes with full
    HTTP response framing. ``gzip_per_record`` writes one gzip member per
    record — the Common-Crawl layout that exercises ``gunzip_members``."""
    out = bytearray()
    for i, (url, ts, html) in enumerate(records):
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            + b"Content-Length: " + str(len(html)).encode() + b"\r\n\r\n"
            + html
        )
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: <urn:uuid:fixture-{i}>\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%SZ')}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode()
        rec = header + http + b"\r\n\r\n"
        out.extend(gzip.compress(rec) if gzip_per_record else rec)
    if not gzip_per_record:
        return bytes(out)
    # prepend a warcinfo member like real crawls (readers must skip it)
    info_body = b"software: spanluke-spark fixture writer\r\n"
    info = (
        "WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        f"Content-Length: {len(info_body)}\r\n\r\n"
    ).encode() + info_body + b"\r\n\r\n"
    return gzip.compress(info) + bytes(out)
