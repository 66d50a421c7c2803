"""Case-name precedent mention extraction (graph/citations.py::case_mentions)."""

from __future__ import annotations

from spanluke_spark.graph.citations import case_mentions


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = case_mentions(df).orderBy("doc_id", "idx")
    return [(r.idx, r.petitioner, r.respondent, r.case_key) for r in out.collect()]


def test_simple_v_dot(spark):
    assert _rows(spark, ["as held in Roe v. Wade the right applies."]) == [
        (0, "Roe", "Wade", "roe v wade")
    ]


def test_multiword_parties_with_connectors(spark):
    got = _rows(spark, ["in State of Punjab vs. Baldev Singh the court ruled."])
    assert got == [
        (0, "State of Punjab", "Baldev Singh", "state of punjab v baldev singh")
    ]


def test_initials_and_key_normalization(spark):
    got = _rows(spark, ["per K.S. Puttaswamy v. Union of India privacy is a right."])
    assert got == [
        (
            0,
            "K.S. Puttaswamy",
            "Union of India",
            "k s puttaswamy v union of india",
        )
    ]


def test_party_does_not_absorb_trailing_connector(spark):
    got = _rows(spark, ["cited Maneka Gandhi v. Union of India the court agreed."])
    # respondent must stop at "India", not absorb the following "the"
    assert got[0][2] == "Union of India"


def test_sentence_opener_stripped(spark):
    got = _rows(spark, ["In Kesavananda Bharati vs State of Kerala it was held."])
    assert got == [
        (
            0,
            "Kesavananda Bharati",
            "State of Kerala",
            "kesavananda bharati v state of kerala",
        )
    ]


def test_document_order_multiple_mentions(spark):
    got = _rows(
        spark,
        ["first Roe v. Wade then later Brown vs. Board of Education was cited."],
    )
    assert [(g[0], g[3]) for g in got] == [
        (0, "roe v wade"),
        (1, "brown v board of education"),
    ]


def test_versus_spelled_out_and_no_match(spark):
    got = _rows(spark, ["Marbury versus Madison settled it.", "no case names here"])
    assert got == [(0, "Marbury", "Madison", "marbury v madison")]


# --- treatment edges ---

from spanluke_spark.graph.citations import case_treatments  # noqa: E402


def _treats(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = case_treatments(df).orderBy("doc_id", "idx")
    return [(r.idx, r.treatment, r.case_key) for r in out.collect()]


def test_treatment_verbs_and_order(spark):
    got = _treats(
        spark,
        [
            "the ratio was followed in Roe v. Wade. it was later "
            "overruled by Dobbs vs. Jackson. and distinguished in "
            "Brown v. Board of Education."
        ],
    )
    assert got == [
        (0, "followed", "roe v wade"),
        (1, "overruled", "dobbs v jackson"),
        (2, "distinguished", "brown v board of education"),
    ]


def test_multiword_treatment_head_verb(spark):
    got = _treats(
        spark,
        ["relied upon in K.S. Puttaswamy v. Union of India as binding."],
    )
    assert got == [(0, "relied", "k s puttaswamy v union of india")]


def test_case_insensitive_verb_but_not_parties(spark):
    got = _treats(spark, ["FOLLOWED IN Maneka Gandhi v. Union of India."])
    assert got == [(0, "followed", "maneka gandhi v union of india")]
    # lowercase parties never match
    assert _treats(spark, ["followed in john v. doe."]) == []
