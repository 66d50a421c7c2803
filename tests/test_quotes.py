"""Quote-attribution mining (etl/quotes.py)."""

from __future__ import annotations

from spanluke_spark.etl.quotes import quote_attributions


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        (r.speaker, r.quote, r.pattern) for r in quote_attributions(df).collect()
    }


def test_said_after(spark):
    got = _rows(spark, ['"Markets will recover," said Jane Doe.'])
    assert got == {("Jane Doe", "Markets will recover", "said_after")}


def test_said_before_colon(spark):
    got = _rows(spark, ['Jane Doe said: "we appealed the ruling."'])
    assert got == {("Jane Doe", "we appealed the ruling", "said_before")}


def test_according_to(spark):
    got = _rows(spark, ['According to Smith, "the statute applies here."'])
    assert got == {("Smith", "the statute applies here", "according")}


def test_trailing_punct_stripped_equal_across_patterns(spark):
    got = _rows(
        spark,
        [
            '"Rates rose," said Ada Park. Ada Park said: "Rates rose." '
            'According to Ada Park, "Rates rose!"'
        ],
    )
    # same quote text after punctuation strip, all three constructions
    assert got == {
        ("Ada Park", "Rates rose", "said_after"),
        ("Ada Park", "Rates rose", "said_before"),
        ("Ada Park", "Rates rose", "according"),
    }


def test_single_token_speaker_and_no_match(spark):
    got = _rows(
        spark,
        ['"Yes," said Bo.', "no quotes in this document at all"],
    )
    assert got == {("Bo", "Yes", "said_after")}


def test_multiple_occurrences_one_doc(spark):
    got_df_texts = [
        '"One," said Kim Lee. Later "Two," said Kim Lee.'
    ]
    got = _rows(spark, got_df_texts)
    assert got == {
        ("Kim Lee", "One", "said_after"),
        ("Kim Lee", "Two", "said_after"),
    }


def test_lowercase_speaker_not_matched(spark):
    got = _rows(spark, ['"nope," said someone lowercase.'])
    assert got == set()
