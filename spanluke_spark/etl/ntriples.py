"""N-Triples source + sink (W3C RDF 1.1 N-Triples) — the lingua franca
for shipping a constructed KG to triple stores and for ingesting
public KG dumps (Wikidata truthy, DBpedia) back into the pipeline.

Both directions are pure codegen (regexp + string expressions per row,
no Python), so serialization fuses into whatever stage produces the
triples and parsing fuses into the text scan:

* ``to_ntriples``: (subj, pred, obj[, obj_is_literal]) -> one ``line``
  per triple. Subjects/predicates become IRIs under ``base_iri``;
  objects serialize as IRIs, or as literals with the four
  canonical-form escapes (backslash, quote, LF, CR) when
  ``obj_is_literal`` is true.
* ``from_ntriples``: lines -> (subj, pred, obj, is_literal, lang) with
  escapes decoded and the base stripped when it matches. Comment and
  blank lines are skipped; anything else non-conforming lands in the
  output with ``is_malformed = true`` rather than vanishing — at crawl
  scale silent drops hide corruption.

Scope: IRIs and plain/lang-tagged string literals (the overwhelming
bulk of real dumps); datatyped literals and blank nodes are parsed
into the raw object slot but not interpreted — the documented cut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NT_LINE = (
    # group 3 keeps its angle brackets so "IRI matched" is testable even
    # for the (legal) empty IRI <>
    r'^<([^<>"{}|^`\\\x00-\x20]*)>\s+<([^<>"{}|^`\\\x00-\x20]*)>\s+'
    r'(?:(<[^<>"{}|^`\\\x00-\x20]*>)|"((?:[^"\\\n\r]|\\.)*)"'
    r"(?:@([a-zA-Z][a-zA-Z0-9-]*))?)\s*\.\s*$"
)


def _escape(col: Column) -> Column:
    out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
    out = F.replace(out, F.lit('"'), F.lit('\\"'))
    out = F.replace(out, F.lit("\n"), F.lit("\\n"))
    return F.replace(out, F.lit("\r"), F.lit("\\r"))


def _unescape(col: Column) -> Column:
    # sequential replace() cannot decode left-to-right: in the encoding
    # of a literal backslash-n ("\\n"), a naive \n pass would eat the
    # tail of the \\ escape. Park \\ in a sentinel first (U+0000 cannot
    # appear in a conforming N-Triples line), decode the short escapes,
    # then restore the backslashes.
    out = F.replace(col, F.lit("\\\\"), F.lit("\x00"))
    out = F.replace(out, F.lit("\\n"), F.lit("\n"))
    out = F.replace(out, F.lit("\\r"), F.lit("\r"))
    out = F.replace(out, F.lit('\\"'), F.lit('"'))
    return F.replace(out, F.lit("\x00"), F.lit("\\"))


def to_ntriples(
    triples: DataFrame,
    base_iri: str = "http://kg.local/",
    literal_col: str | None = None,
) -> DataFrame:
    """triples(subj, pred, obj[, literal_col: boolean]) -> (line)."""
    iri = lambda c: F.concat(F.lit("<" + base_iri), c, F.lit(">"))  # noqa: E731
    lit = F.concat(F.lit('"'), _escape(F.col("obj")), F.lit('"'))
    obj = (
        F.when(F.col(literal_col), lit).otherwise(iri(F.col("obj")))
        if literal_col
        else iri(F.col("obj"))
    )
    return triples.select(
        F.concat(
            iri(F.col("subj")), F.lit(" "),
            iri(F.col("pred")), F.lit(" "),
            obj, F.lit(" ."),
        ).alias("line")
    )


def from_ntriples(
    lines: DataFrame,
    line_col: str = "line",
    base_iri: str = "http://kg.local/",
) -> DataFrame:
    """lines -> (subj, pred, obj, is_literal, lang, is_malformed)."""
    raw = F.col(line_col)
    body = lines.where(
        (F.trim(raw) != "") & ~F.trim(raw).startswith("#")
    )
    strip = lambda c: F.regexp_replace(  # noqa: E731
        c, "^" + base_iri.replace(".", r"\."), ""
    )
    g = lambda i: F.regexp_extract(raw, _NT_LINE, i)  # noqa: E731
    matched = F.regexp_like(raw, F.lit(_NT_LINE))
    is_lit = matched & (g(3) == "")
    obj_iri = strip(
        F.regexp_replace(g(3), r"^<|>$", "")
    )
    return body.select(
        F.when(matched, strip(g(1))).alias("subj"),
        F.when(matched, strip(g(2))).alias("pred"),
        F.when(~matched, F.lit(None))
        .when(is_lit, _unescape(g(4)))
        .otherwise(obj_iri)
        .alias("obj"),
        F.when(matched, is_lit).alias("is_literal"),
        F.when(matched & is_lit & (g(5) != ""), g(5)).alias("lang"),
        (~matched).alias("is_malformed"),
    )
