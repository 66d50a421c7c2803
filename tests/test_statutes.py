"""Indian statute-citation extraction (etl/statutes.py)."""

from __future__ import annotations

from spanluke_spark.etl.statutes import statute_citations


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = statute_citations(df).orderBy("doc_id", "cite_idx", "sec_idx")
    return [
        (r.cite_idx, r.sec_idx, r.provision, r.kind, r.statute)
        for r in out.collect()
    ]


def test_us_slash_list_ipc(spark):
    assert _rows(spark, ["convicted u/s 302/34 IPC."]) == [
        (0, 0, "302", "section", "IPC"),
        (0, 1, "34", "section", "IPC"),
    ]


def test_sections_comma_and_list_full_name(spark):
    got = _rows(
        spark, ["charged under Sections 147, 148 and 149 of the Indian Penal Code."]
    )
    assert got == [
        (0, 0, "147", "section", "IPC"),
        (0, 1, "148", "section", "IPC"),
        (0, 2, "149", "section", "IPC"),
    ]


def test_article_constitution(spark):
    got = _rows(spark, ["petition under Article 21 of the Constitution of India."])
    assert got == [(0, 0, "21", "article", "Constitution")]


def test_dotted_crpc_abbreviation(spark):
    got = _rows(spark, ["the High Court invoked Section 482 Cr.P.C. to quash."])
    assert got == [(0, 0, "482", "section", "CrPC")]


def test_alpha_suffix_and_subsection(spark):
    got = _rows(spark, ["u/s 304B IPC and Section 313(1)(b) of the Code"])
    assert got[0] == (0, 0, "304B", "section", "IPC")
    assert got[1][2] == "313(1)(b)"


def test_read_with_separator(spark):
    got = _rows(spark, ["Section 306 read with 114 IPC applies."])
    assert got == [
        (0, 0, "306", "section", "IPC"),
        (0, 1, "114", "section", "IPC"),
    ]


def test_named_act_with_year(spark):
    got = _rows(spark, ["Section 5 of the Prevention of Corruption Act, 1988 bars it."])
    # "Prevention of ..." breaks at lowercase 'of'; the regex still lands on
    # the trailing "Corruption Act, 1988" — canonical falls back to surface
    assert len(got) == 1
    assert got[0][2] == "5" and got[0][4].endswith("Act, 1988")


def test_document_order_and_no_match(spark):
    got = _rows(
        spark,
        ["Article 14 of the Constitution. Then Section 34 IPC.", "no citations here"],
    )
    assert [(g[0], g[2], g[4]) for g in got] == [
        (0, "14", "Constitution"),
        (1, "34", "IPC"),
    ]
