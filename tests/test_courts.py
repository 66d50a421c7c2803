"""Court and witness mention extraction (etl/courts.py)."""

from __future__ import annotations

from spanluke_spark.etl.courts import court_mentions, witness_refs


def _courts(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = court_mentions(df).orderBy("doc_id", "idx")
    return [(r.idx, r.court, r.level) for r in out.collect()]


def _witnesses(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = witness_refs(df).orderBy("doc_id", "idx")
    return [(r.idx, r.surface, r.witness_no, r.side) for r in out.collect()]


def test_supreme_court_case_insensitive(spark):
    got = _courts(spark, ["IN THE SUPREME COURT OF INDIA the appeal lies."])
    assert got == [(0, "supreme court of india", "supreme")]


def test_high_court_judicature_form(spark):
    got = _courts(spark, ["before the HIGH COURT OF JUDICATURE AT BOMBAY."])
    assert got == [(0, "high court of bombay", "high")]


def test_high_court_of_city(spark):
    got = _courts(spark, ["the High Court of Delhi held otherwise."])
    assert got == [(0, "high court of delhi", "high")]


def test_sessions_and_district(spark):
    got = _courts(
        spark,
        ["remanded to the Sessions Court, then the District Court of Pune."],
    )
    assert got == [
        (0, "sessions court", "sessions"),
        (1, "district court of pune", "district"),
    ]


def test_document_order_multiple_courts(spark):
    got = _courts(
        spark,
        ["the High Court at Madras reversed; the Supreme Court of India restored."],
    )
    assert [(g[1], g[2]) for g in got] == [
        ("high court of madras", "high"),
        ("supreme court of india", "supreme"),
    ]


def test_witness_forms_and_sides(spark):
    got = _witnesses(spark, ["PW-1 deposed; DW 2 denied; CW.3 was recalled."])
    assert got == [
        (0, "PW-1", 1, "prosecution"),
        (1, "DW 2", 2, "defence"),
        (2, "CW.3", 3, "court"),
    ]


def test_witness_word_boundary(spark):
    # "HDPW-9" must not produce a witness; "PW10" (no separator) must
    assert _witnesses(spark, ["code HDPW-9 is a part number"]) == []
    assert _witnesses(spark, ["then PW10 identified the accused"]) == [
        (0, "PW10", 10, "prosecution")
    ]
