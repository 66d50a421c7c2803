"""F12: deterministic HTML -> text extraction (BASELINE.json north_star:
'deterministic HTML-to-text extraction (byte-identical per url)').

Pure stdlib (html.parser), no network, no locale dependence: the extractor is
a pure function of the html bytes, so byte-identity per url holds under any
partitioning/retry/speculative execution. Runs as one mapInPandas hop; the
huge ``html: binary`` column is dropped immediately after (column pruning —
never carry it past this stage, SURVEY.md §4.2).
"""

from __future__ import annotations

from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

# Elements whose content is dropped entirely.
_SKIP = {"script", "style", "noscript", "template", "head"}
# Elements that imply a line break before and after their content.
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "h1", "h2", "h3",
    "h4", "h5", "h6", "article", "section", "header", "footer", "blockquote",
    "pre", "hr", "title", "body",
}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP:
            self._skip_depth += 1
        elif tag in _BLOCK:
            self._chunks.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        elif tag in _BLOCK:
            self._chunks.append("\n")

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0:
            self._chunks.append(data)

    def text(self) -> str:
        # Normalize: collapse intra-line whitespace, strip lines, drop empties.
        raw = "".join(self._chunks)
        lines = [" ".join(line.split()) for line in raw.split("\n")]
        return "\n".join(line for line in lines if line)


def py_html_to_text(html: bytes | str | None) -> str:
    """Deterministic HTML -> text. Pure function; UTF-8 with replacement."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    try:
        parser.feed(html)
        parser.close()
    except Exception:  # malformed markup must never kill a 10^12-row job
        pass
    return parser.text()


def extract_text(pages: DataFrame, html_col: str = "html", out_col: str = "text") -> DataFrame:
    """pages(url, warc_ts, html, ...) -> same minus html, plus extracted text.

    The binary column is pruned in the same projection: downstream stages never
    shuffle raw HTML.
    """
    keep = [c for c in pages.columns if c not in (html_col, out_col)]
    out_schema = ", ".join(
        [f"`{c}` {pages.schema[c].dataType.simpleString()}" for c in keep]
        + [f"{out_col} string"]
    )

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[keep].copy()
            out[out_col] = pdf[html_col].map(py_html_to_text)
            yield out

    return pages.select(*keep, html_col).mapInPandas(_extract, out_schema)
