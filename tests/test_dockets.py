"""Docket identifiers and paragraph cross-references (etl/dockets.py)."""

from __future__ import annotations

from spanluke_spark.etl.dockets import (
    docket_refs,
    para_crossrefs,
    validated_crossrefs,
)
from spanluke_spark.etl.paragraphs import split_paragraphs


def _dockets(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = docket_refs(df).orderBy("doc_id", "idx")
    return [(r.idx, r.kind, r.number, r.year, r.docket_key) for r in out.collect()]


def test_of_and_slash_forms_same_key(spark):
    got = _dockets(
        spark,
        [
            "in Criminal Appeal No. 124 of 2005 and later "
            "Criminal Appeal No. 124/2005 again."
        ],
    )
    assert got == [
        (0, "Criminal Appeal", 124, 2005, "criminalappeal:124:2005"),
        (1, "Criminal Appeal", 124, 2005, "criminalappeal:124:2005"),
    ]


def test_wp_c_and_slp_abbreviations(spark):
    got = _dockets(
        spark,
        ["W.P. (C) No. 1234/2019 was tagged with S.L.P. No. 77 of 2020."],
    )
    assert [(g[4]) for g in got] == ["wpc:1234:2019", "slp:77:2020"]


def test_fir_and_year_guard(spark):
    got = _dockets(
        spark,
        ["FIR No. 123/2004 registered; invoice No. 55/1234 is not a docket."],
    )
    assert got == [(0, "FIR", 123, 2004, "fir:123:2004")]


def test_para_crossref_validation(spark):
    text = "1. First.\n2. see para 1 above and para 9 below.\n3. End."
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    out = validated_crossrefs(para_crossrefs(df), split_paragraphs(df))
    got = {(r.ref_para, r.resolved) for r in out.collect()}
    assert got == {(1, True), (9, False)}
