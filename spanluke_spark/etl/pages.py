"""Synthetic Common-Crawl-style pages table (FIXTURES.md §1).

Deterministic templated HTML embedding the driver's ``documents`` texts at
known positions, so expected extractions/mentions/triples are computable
exactly. This is the local stand-in for the 10^12-row Iceberg ``pages`` table
of the north_rule (schema per BASELINE.json input_hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def synthesize_pages(documents: DataFrame) -> DataFrame:
    """documents(doc_id, text, lang, ...) -> pages(url, warc_ts, html, text, lang).

    html embeds the document text in a fixed template (with script/style noise
    the extractor must drop); ``text`` is left NULL — the pipeline must fill it
    via extract_text, and the expected value is exactly:
    ``Document {doc_id}\\n{text}\\ncrawl footer``.
    """
    url = F.concat(F.lit("https://example.org/doc/"), F.col("doc_id").cast("string"))
    warc_ts = F.timestamp_seconds(F.lit(1700000000) + F.col("doc_id") * 60)
    html = F.concat(
        F.lit(
            "<html><head><title>t</title><style>body{color:red}</style>"
            "<script>var x=1;</script></head><body><h1>Document "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><div>crawl footer</div></body></html>"),
    ).cast("binary")
    return documents.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )


def expected_page_text(doc_id: int, text: str) -> str:
    """Oracle for the extractor over synthesize_pages output."""
    body = " ".join(text.split())
    return f"Document {doc_id}\n{body}\ncrawl footer"
