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


# --- ordered extraction + pronoun coref ---

from spanluke_spark.etl.quotes import (  # noqa: E402
    quote_attributions_ordered,
    resolve_pronoun_speakers,
)


def _resolved(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = resolve_pronoun_speakers(quote_attributions_ordered(df))
    return [
        (r.idx, r.speaker, r.quote, r.pattern, r.is_pronoun, r.resolved_speaker)
        for r in out.orderBy("doc_id", "idx").collect()
    ]


def test_document_order_across_patterns(spark):
    rows = _resolved(
        spark,
        [
            'Jane Doe said: "first." "second," said Kim Lee. '
            'According to Jane Doe, "third."'
        ],
    )
    assert [(r[0], r[3]) for r in rows] == [
        (0, "said_before"),
        (1, "said_after"),
        (2, "according"),
    ]
    assert [r[2] for r in rows] == ["first", "second", "third"]


def test_pronoun_resolves_to_nearest_preceding_named(spark):
    rows = _resolved(
        spark,
        [
            '"intro," said Jane Doe. "more," said She. '
            '"other," said Kim Lee. "last," said He.'
        ],
    )
    assert [(r[1], r[4], r[5]) for r in rows] == [
        ("Jane Doe", False, "Jane Doe"),
        ("She", True, "Jane Doe"),
        ("Kim Lee", False, "Kim Lee"),
        ("He", True, "Kim Lee"),
    ]


def test_unresolved_leading_pronoun_keeps_surface(spark):
    rows = _resolved(spark, ['"orphan," said He. "named," said Bo Ray.'])
    assert [(r[1], r[4], r[5]) for r in rows] == [
        ("He", True, "He"),
        ("Bo Ray", False, "Bo Ray"),
    ]


def test_coref_does_not_cross_documents(spark):
    rows = _resolved(
        spark,
        ['"a," said Jane Doe.', '"b," said She.'],
    )
    # doc 1's pronoun must NOT see doc 0's speaker
    assert [(r[1], r[5]) for r in rows] == [("Jane Doe", "Jane Doe"), ("She", "She")]
