"""Organization extraction by legal-suffix anchoring (etl/orgs.py)."""

from __future__ import annotations

from spanluke_spark.etl.orgs import org_mentions


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = org_mentions(df).orderBy("doc_id", "idx")
    return [(r.idx, r.name, r.suffix, r.org_key) for r in out.collect()]


def test_ltd_and_limited_same_key(spark):
    got = _rows(
        spark,
        ["Tata Motors Ltd. appealed; Tata Motors Limited is the same entity."],
    )
    assert got[0][3] == got[1][3] == "tata motors ltd"


def test_pvt_ltd_variants_collapse(spark):
    got = _rows(
        spark,
        ["Acme Widgets Pvt. Ltd. merged with Beta Tools Private Limited."],
    )
    assert [(g[2]) for g in got] == ["pvt ltd", "pvt ltd"]
    assert got[0][3] == "acme widgets pvt ltd"


def test_connectors_in_name(spark):
    got = _rows(spark, ["the Bank of Industry and Commerce Ltd. defaulted."])
    assert got == [
        (0, "Bank of Industry and Commerce", "ltd", "bank of industry and commerce ltd")
    ]


def test_inc_llp_corp(spark):
    got = _rows(
        spark,
        ["Apple Inc. sued Orange LLP while Pear Corp. watched."],
    )
    assert [(g[1], g[2]) for g in got] == [
        ("Apple", "inc"),
        ("Orange", "llp"),
        ("Pear", "corp"),
    ]


def test_suffix_requires_boundary(spark):
    # "Ltda" (Brazilian) must not match the Ltd suffix
    assert _rows(spark, ["Empresa Brasileira Ltda filed."]) == []
