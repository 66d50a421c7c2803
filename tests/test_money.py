"""Monetary amounts and sentence terms (etl/money.py)."""

from __future__ import annotations

from spanluke_spark.etl.money import money_amounts, sentence_terms


def _money(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = money_amounts(df).orderBy("doc_id", "idx")
    return [(r.idx, r.currency, r.amount) for r in out.collect()]


def _terms(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = sentence_terms(df).orderBy("doc_id", "idx")
    return [(r.idx, r.regime, r.term_months) for r in out.collect()]


def test_lakh_grouping_and_plain(spark):
    got = _money(spark, ["fine of Rs. 5,00,000 i.e. Rs. 5 lakhs imposed."])
    assert got == [(0, "INR", 500000.0), (1, "INR", 500000.0)]


def test_crore_and_decimal(spark):
    got = _money(spark, ["compensation of Rs. 1.2 crore awarded."])
    assert got == [(0, "INR", 12000000.0)]


def test_usd_million(spark):
    got = _money(spark, ["a $3 million settlement plus USD 250 was paid."])
    assert got == [(0, "USD", 3000000.0), (1, "USD", 250.0)]


def test_inr_symbol_and_case_insensitive_unit(spark):
    got = _money(spark, ["deposit INR 10 LAKHS with the registry."])
    assert got == [(0, "INR", 1000000.0)]


def test_sentence_terms_normalize_to_months(spark):
    got = _terms(
        spark,
        [
            "sentenced to rigorous imprisonment for 10 years and "
            "simple imprisonment of 6 months."
        ],
    )
    assert got == [(0, "rigorous", 120), (1, "simple", 6)]


def test_term_days_floor(spark):
    got = _terms(spark, ["simple imprisonment for 45 days awarded."])
    assert got == [(0, "simple", 1)]


def test_no_bare_numbers(spark):
    assert _money(spark, ["page 500 of the record"]) == []
    assert _terms(spark, ["for 10 years the suit lingered"]) == []
