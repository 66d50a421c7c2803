"""Disposition extraction and operative outcome (etl/outcomes.py)."""

from __future__ import annotations

from spanluke_spark.etl.outcomes import doc_outcome, outcome_mentions


def _mentions(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = outcome_mentions(df).orderBy("doc_id", "idx")
    return [(r.idx, r.subject, r.outcome) for r in out.collect()]


def test_basic_dispositions(spark):
    got = _mentions(
        spark,
        ["The appeal is allowed. The conviction is set aside."],
    )
    assert got == [(0, "appeal", "allowed"), (1, "conviction", "set_aside")]


def test_case_insensitive_and_stands(spark):
    got = _mentions(spark, ["the APPEAL STANDS DISMISSED accordingly."])
    assert got == [(0, "appeal", "dismissed")]


def test_operative_outcome_is_last(spark):
    df = spark.createDataFrame(
        [
            (
                0,
                "the trial court held the accused was convicted. on appeal "
                "the matter was remanded. finally the accused is acquitted.",
            )
        ],
        "doc_id long, text string",
    )
    row = doc_outcome(outcome_mentions(df)).collect()[0]
    assert row.n_mentions == 3
    assert (row.subject, row.outcome) == ("accused", "acquitted")


def test_no_copula_no_match(spark):
    # bare "appeal allowed" without is/was/stands is a headline, not an
    # operative statement
    assert _mentions(spark, ["appeal allowed in part says the headnote"]) == []
