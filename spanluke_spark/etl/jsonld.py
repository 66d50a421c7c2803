"""JSON-LD (schema.org) triple extraction from embedded HTML markup — the
Web Data Commons method (Meusel et al. 2014, "The WebDataCommons Microdata,
RDFa and Microformat Dataset Series"): the dominant real-world source of
web-scale knowledge-graph triples is the ``<script type="application/ld+json">``
block publishers embed for search engines.

Pipeline: regexp-extract every JSON-LD script block → enumerate nodes
(bare object, top-level array, or ``@graph`` node list) → flatten each node
to (subj, pred, obj) triples:

- ``@type``            → (subj, 'rdf:type', type) — string or array form;
- scalar property      → literal triple (numbers/booleans in their JSON
                          source text — both engines emit the raw token);
- array property       → one triple per element;
- object property      → if the object carries ``@id`` it is a REFERENCE
                          (obj = that iri); otherwise it becomes a
                          deterministic blank node ``<parent-subj>.<key>[<i>]``
                          (parents without ``@id`` get ``_:<url>#<node>``
                          subjects first) linked with ``obj_kind='blank'``,
                          and its own scalar properties are flattened one
                          level down;
- anything still nested below that (depth ≥ 3) degrades to the minified
  raw JSON text with ``obj_kind='raw_json'`` — never dropped silently.

Everything is codegen (`regexp_extract_all`, `get_json_object`,
`json_object_keys`, `json_array_length`, `explode`) — zero Python in the
row path, so the extraction fuses into the page scan and the only shuffle
in a typical (extract → dedupe) job is the final triple distinct. Blank-node
ids are pure functions of (url, node index, key, element index): re-crawls
re-derive identical ids, so downstream exact dedup collapses them.

Type detection uses the portable heuristic ``json_object_keys IS NOT NULL``
(object) / ``json_array_length IS NOT NULL`` (array): Spark has no
``json_type``. A STRING literal whose text is itself valid JSON (e.g. the
value ``"[1,2]"``) is classified by its content — acceptable for crawl
markup, documented here. Keys containing quotes or brackets would break the
concatenated JSON path and are filtered out up front.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_jsonld_blocks", "jsonld_triples"]

_SCRIPT_RE = (
    r"(?is)<script[^>]*type\s*=\s*['\"]application/ld\+json['\"][^>]*>(.*?)</script>"
)
# keys that would break the concatenated $['k'] path (or are JSON-LD syntax)
_BAD_KEY = r"['\"\[\]]"


def _jget(col: Column, key: str) -> Column:
    """get_json_object with a literal key spliced into a bracketed path."""
    return F.get_json_object(col, f"$['{key}']")


# get_json_object's PySpark wrapper only takes literal paths; the SQL form
# accepts computed paths (re-parsed per row — fine, paths are tiny). Built
# lazily: F.expr needs an active session.
def _node_at_elem() -> Column:
    return F.expr(
        "get_json_object(node_list, concat('$[', cast(elem_idx as string), ']'))"
    )


def _value_of_key() -> Column:
    return F.expr("get_json_object(node, concat('$[\\'', k, '\\']'))")


def _elem_of_arr() -> Column:
    return F.expr("get_json_object(v, concat('$[', cast(ei as string), ']'))")


def _is_obj(v: Column) -> Column:
    return F.json_object_keys(v).isNotNull()


def _is_arr(v: Column) -> Column:
    return F.json_array_length(v).isNotNull() & F.json_object_keys(v).isNull()


def extract_jsonld_blocks(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """-> (url, node_idx, node): every JSON-LD node on every page.

    A page may carry several script blocks; each block may be a bare node,
    an array of nodes, or a ``@graph`` wrapper. ``node_idx`` numbers nodes
    within the page (block-major, element-minor) so blank-node ids are
    stable per url.
    """
    blocks = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(F.col(html_col), F.lit(_SCRIPT_RE), 1)
        ).alias("block_idx", "block"),
    ).withColumn("block", F.trim("block"))

    graph = _jget(F.col("block"), "@graph")
    node_list = F.when(_is_arr(F.col("block")), F.col("block")).when(
        _is_obj(F.col("block")) & graph.isNotNull(), graph
    )
    nodes = (
        blocks.withColumn("node_list", node_list)
        .withColumn(
            "elem_idx",
            F.explode(
                F.when(
                    F.col("node_list").isNotNull(),
                    F.sequence(
                        F.lit(0), F.json_array_length("node_list") - 1
                    ),
                ).otherwise(F.array(F.lit(-1)))
            ),
        )
        .select(
            "url",
            "block_idx",
            "elem_idx",
            F.when(F.col("elem_idx") >= 0, _node_at_elem())
            .otherwise(F.col("block"))
            .alias("node"),
        )
        .filter(_is_obj(F.col("node")))
        # block-major, element-minor node numbering within the page
        .withColumn(
            "node_idx",
            (F.col("block_idx") * 1000 + F.greatest(F.col("elem_idx"), F.lit(0))),
        )
        .select("url", "node_idx", "node")
    )
    return nodes


def _props(nodes: DataFrame) -> DataFrame:
    """Explode (subj, node) into (subj, key, value-json) property rows."""
    return (
        nodes.select(
            "url",
            "subj",
            "node",
            F.explode(F.json_object_keys("node")).alias("k"),
        )
        .filter(~F.col("k").isin("@id", "@context"))
        .filter(~F.col("k").rlike(_BAD_KEY))
        .withColumn("v", _value_of_key())
        .filter(F.col("v").isNotNull())
    )


def _elements(props: DataFrame) -> DataFrame:
    """Unroll array values to one row per element (elem_idx = -1 for
    non-array values, so blank-node naming stays uniform)."""
    return props.select(
        "url",
        "subj",
        "k",
        F.explode(
            F.when(
                _is_arr(F.col("v")),
                F.sequence(F.lit(0), F.json_array_length("v") - 1),
            ).otherwise(F.array(F.lit(-1)))
        ).alias("ei"),
        "v",
    ).withColumn(
        "e",
        F.when(F.col("ei") >= 0, _elem_of_arr()).otherwise(F.col("v")),
    )


def _flatten_level(elems: DataFrame, emit_nested: bool) -> tuple[DataFrame, DataFrame]:
    """-> (triples, nested_nodes). ``nested_nodes`` are object elements
    without @id, assigned blank subjects; when ``emit_nested`` is False they
    degrade to raw_json triples instead (the depth cutoff)."""
    is_type = F.col("k") == "@type"
    e_obj = _is_obj(F.col("e"))
    e_id = _jget(F.col("e"), "@id")
    blank = F.concat(
        F.col("subj"),
        F.lit("."),
        F.col("k"),
        F.lit("["),
        F.greatest(F.col("ei"), F.lit(0)).cast("string"),
        F.lit("]"),
    )

    kind = (
        F.when(is_type, F.lit("iri"))
        .when(e_obj & e_id.isNotNull(), F.lit("iri"))
        .when(e_obj & e_id.isNull(), F.lit("blank" if emit_nested else "raw_json"))
        .otherwise(F.lit("literal"))
    )
    obj = (
        F.when(is_type, F.col("e"))
        .when(e_obj & e_id.isNotNull(), e_id)
        .when(e_obj & e_id.isNull(), blank if emit_nested else F.col("e"))
        .otherwise(F.col("e"))
    )
    pred = F.when(is_type, F.lit("rdf:type")).otherwise(F.col("k"))

    triples = elems.select(
        "url",
        "subj",
        pred.alias("pred"),
        obj.alias("obj"),
        kind.alias("obj_kind"),
    )
    nested = (
        elems.filter(e_obj & e_id.isNull() & ~is_type).select(
            "url", blank.alias("subj"), F.col("e").alias("node")
        )
        if emit_nested
        else elems.limit(0).select(
            "url", F.lit("").alias("subj"), F.col("e").alias("node")
        )
    )
    return triples, nested


def jsonld_triples(
    pages: DataFrame, html_col: str = "html", url_col: str = "url"
) -> DataFrame:
    """-> (url, subj, pred, obj, obj_kind): the page's JSON-LD markup as
    flat triples. obj_kind ∈ {iri, literal, blank, raw_json}; ``blank``
    marks a link to a nested anonymous node whose own properties follow
    under the blank subject.
    """
    nodes = extract_jsonld_blocks(pages, html_col=html_col, url_col=url_col)
    level0 = nodes.select(
        "url",
        F.coalesce(
            _jget(F.col("node"), "@id"),
            F.concat(
                F.lit("_:"), F.col("url"), F.lit("#"), F.col("node_idx").cast("string")
            ),
        ).alias("subj"),
        "node",
    )
    t0, nested = _flatten_level(_elements(_props(level0)), emit_nested=True)
    t1, _ = _flatten_level(_elements(_props(nested)), emit_nested=False)
    return t0.unionByName(t1)
