"""HTML table extraction — the WebTables lane of web-scale KG construction
(Cafarella et al. 2008, "WebTables: Exploring the Power of Tables on the
Web"; the WDC Web Table Corpus does exactly this over Common Crawl):
relational facts published as <table> markup outnumber structured markup
on many sites, so a crawl pipeline mines them alongside JSON-LD (etl.jsonld).

Three nested posexplode stages (table -> tr -> td/th), all regex codegen —
zero Python, zero shuffle: the whole extraction fuses into the page scan.
Cell text is tag-stripped and entity-unescaped (the four XML entities +
&nbsp;). ``table_facts`` joins each data cell to its column header by
position, producing (url, table_idx, row_idx, header, value) — the
attribute-value pairs a KG attribute-extraction stage consumes.

Scope (documented, tested): rowspan/colspan offsets are NOT applied (cells
keep their source positions — the WDC corpus makes the same simplification
for its relational-table class) and nested tables inside cells are not
re-entered (the inner markup is stripped with the other tags).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["table_cells", "table_facts"]

_TABLE_RE = r"(?is)<table[^>]*>(.*?)</table>"
_TR_RE = r"(?is)<tr[^>]*>(.*?)</tr>"
_CELL_RE = r"(?is)<t[dh][^>]*>(.*?)</t[dh]>"


def _clean(cell: Column) -> Column:
    txt = F.regexp_replace(cell, r"(?s)<[^>]*>", "")
    txt = F.regexp_replace(txt, "&nbsp;", " ")
    txt = F.regexp_replace(txt, "&lt;", "<")
    txt = F.regexp_replace(txt, "&gt;", ">")
    txt = F.regexp_replace(txt, "&quot;", '"')
    # ampersand last so &amp;lt; decodes to the literal "&lt;"
    txt = F.regexp_replace(txt, "&amp;", "&")
    return F.trim(F.regexp_replace(txt, r"\s+", " "))


def table_cells(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """-> (url, table_idx, row_idx, col_idx, cell, is_header): every cell
    of every table, positions 0-based, header = the row uses <th>."""
    tables = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_TABLE_RE), 1)
        ).alias("table_idx", "tbl"),
    )
    rows = tables.select(
        "url",
        "table_idx",
        F.posexplode(F.regexp_extract_all(F.col("tbl"), F.lit(_TR_RE), 1)).alias(
            "row_idx", "tr"
        ),
    )
    return rows.select(
        "url",
        "table_idx",
        "row_idx",
        F.col("tr").rlike(r"(?is)<th[\s>]").alias("is_header"),
        F.posexplode(F.regexp_extract_all(F.col("tr"), F.lit(_CELL_RE), 1)).alias(
            "col_idx", "cell"
        ),
    ).select(
        "url", "table_idx", "row_idx", "col_idx", _clean(F.col("cell")).alias("cell"),
        "is_header",
    )


def table_facts(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """-> (url, table_idx, row_idx, header, value): data cells matched to
    their column header by position. Tables whose first row is not a
    header row yield no facts (the WDC relational-table criterion).

    Shuffle-free: the header array is derived IN-ROW from each table
    fragment (first <tr> re-parsed to a transformed array) instead of
    joining a headers relation back onto the cell stream — at 10^12 pages
    that join would shuffle every cell; this formulation is three nested
    explodes with a positional element_at, zero exchanges."""
    tables = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_TABLE_RE), 1)
        ).alias("table_idx", "tbl"),
    )
    trs = F.regexp_extract_all(F.col("tbl"), F.lit(_TR_RE), 1)
    first_tr = F.element_at(trs, 1)
    headers = F.transform(
        F.regexp_extract_all(first_tr, F.lit(_CELL_RE), 1), _clean
    )
    rows = (
        tables.withColumn("headers", headers)
        .where(first_tr.rlike(r"(?is)<th[\s>]"))
        .select(
            "url",
            "table_idx",
            "headers",
            F.posexplode(trs).alias("row_idx", "tr"),
        )
        .where(F.col("row_idx") > 0)
        .where(~F.col("tr").rlike(r"(?is)<th[\s>]"))
    )
    return (
        rows.select(
            "url",
            "table_idx",
            "row_idx",
            "headers",
            F.posexplode(
                F.regexp_extract_all(F.col("tr"), F.lit(_CELL_RE), 1)
            ).alias("col_idx", "cell"),
        )
        .withColumn(
            "header", F.try_element_at(F.col("headers"), F.col("col_idx") + 1)
        )
        .where(F.col("header").isNotNull())
        .select(
            "url", "table_idx", "row_idx", "header", _clean(F.col("cell")).alias("value")
        )
    )
