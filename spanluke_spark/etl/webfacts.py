"""Unified markup-to-KG extraction: run all three Web Data Commons lanes
(JSON-LD, HTML5 microdata, HTML tables) over a crawl page stream and emit
ONE normalized (subj, pred, obj, source_lane) fact relation — the
composition a production KG-construction pipeline actually runs (WDC
publishes exactly this union as its quad corpus).

Normalization: JSON-LD keeps its subjects (@id or deterministic blanks);
microdata items get ``md:<url>#<item_idx>`` subjects and their itemtype
becomes an rdf:type fact; table rows get ``tbl:<url>#<table>.<row>``
subjects with headers as predicates. All three lanes are pure-codegen
scan-side extractions (see the lane modules), so the union is ONE pass
over the pages with three projection branches — Spark unions are plan
concatenation, not a shuffle — and the only exchange in an
extract→dedupe job remains the final distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .jsonld import jsonld_triples
from .microdata import microdata_items
from .webtables import table_facts

__all__ = ["extract_web_facts"]


def extract_web_facts(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """-> (url, subj, pred, obj, lane): every fact any markup lane can
    mine from every page; lane ∈ {jsonld, microdata, table}."""
    jl = jsonld_triples(pages, html_col=html_col, url_col=url_col).select(
        "url", "subj", "pred", "obj", F.lit("jsonld").alias("lane")
    )

    md = microdata_items(pages, html_col=html_col, url_col=url_col)
    md_subj = F.concat(
        F.lit("md:"), F.col("url"), F.lit("#"), F.col("item_idx").cast("string")
    )
    md_props = md.select(
        "url",
        md_subj.alias("subj"),
        F.col("prop").alias("pred"),
        F.col("value").alias("obj"),
        F.lit("microdata").alias("lane"),
    )
    md_types = (
        md.where(F.col("item_type").isNotNull())
        .select(
            "url",
            md_subj.alias("subj"),
            F.lit("rdf:type").alias("pred"),
            F.col("item_type").alias("obj"),
            F.lit("microdata").alias("lane"),
        )
        .distinct()
    )

    tf = table_facts(pages, html_col=html_col, url_col=url_col).select(
        "url",
        F.concat(
            F.lit("tbl:"),
            F.col("url"),
            F.lit("#"),
            F.col("table_idx").cast("string"),
            F.lit("."),
            F.col("row_idx").cast("string"),
        ).alias("subj"),
        F.col("header").alias("pred"),
        F.col("value").alias("obj"),
        F.lit("table").alias("lane"),
    )

    return jl.unionByName(md_props).unionByName(md_types).unionByName(tf)
