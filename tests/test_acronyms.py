"""Parenthetical acronym mining (etl/acronyms.py)."""

from __future__ import annotations

from spanluke_spark.etl.acronyms import acronym_definitions, acronym_support


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = acronym_definitions(df).orderBy("doc_id", "idx")
    return [(r.doc_id, r.long_form, r.acronym) for r in out.collect()]


def test_basic_definition_with_connectors(spark):
    got = _rows(spark, ["under the Prevention of Corruption Act (PCA) it is."])
    assert got == [(0, "Prevention of Corruption Act", "PCA")]


def test_mismatched_parenthetical_dropped(spark):
    got = _rows(
        spark,
        [
            "the National Company Law Tribunal (NCLT) heard it; "
            "the Delhi Bench (see below) did not."
        ],
    )
    assert got == [(0, "National Company Law Tribunal", "NCLT")]


def test_wrong_initials_dropped(spark):
    assert _rows(spark, ["the Central Bureau (XYZ) failed validation."]) == []


def test_two_letter_minimum(spark):
    # single-letter parentheticals are not acronyms
    assert _rows(spark, ["exhibit Marked Annexure (A) here."]) == []
    got = _rows(spark, ["the Reserve Bank (RB) notified."])
    assert got == [(0, "Reserve Bank", "RB")]


def test_support_counts_distinct_docs(spark):
    df = spark.createDataFrame(
        [
            (0, "the Supreme Court (SC) held. again the Supreme Court (SC)."),
            (1, "per the Supreme Court (SC)."),
            (2, "the Sessions Court (SC) differs."),
        ],
        "doc_id long, text string",
    )
    sup = {
        (r.acronym, r.long_form): r.n_docs
        for r in acronym_support(acronym_definitions(df)).collect()
    }
    assert sup[("SC", "Supreme Court")] == 2
    assert sup[("SC", "Sessions Court")] == 1
