"""In-text date extraction and ISO normalization (etl/dates.py)."""

from __future__ import annotations

import datetime

from spanluke_spark.etl.dates import extract_dates


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = extract_dates(df).orderBy("doc_id", "idx")
    return [(r.idx, r.surface, r.pattern, r.iso, r.ambiguous) for r in out.collect()]


def test_numeric_dotted_ddmmyyyy(spark):
    got = _rows(spark, ["order dated 25.03.2004 was passed."])
    assert got == [(0, "25.03.2004", "numeric", datetime.date(2004, 3, 25), False)]


def test_numeric_ambiguous_day_le_12(spark):
    got = _rows(spark, ["hearing on 05/04/2010 adjourned."])
    assert got == [(0, "05/04/2010", "numeric", datetime.date(2010, 4, 5), True)]


def test_mixed_separator_rejected(spark):
    # separator must repeat: 12.03-2004 is not a date
    assert _rows(spark, ["value 12.03-2004 is a code"]) == []


def test_dmy_name_with_ordinal(spark):
    got = _rows(spark, ["on 5th January, 1998 the decree issued."])
    assert got == [(0, "5th January, 1998", "dmy_name", datetime.date(1998, 1, 5), False)]


def test_mdy_name(spark):
    got = _rows(spark, ["filed September 21, 1973 in court."])
    assert got == [(0, "September 21, 1973", "mdy_name", datetime.date(1973, 9, 21), False)]


def test_invalid_calendar_date_null_iso(spark):
    got = _rows(spark, ["the impossible 31.02.2001 entry."])
    assert len(got) == 1
    assert got[0][3] is None and got[0][2] == "numeric"


def test_year_guard_excludes_section_numbers(spark):
    assert _rows(spark, ["Section 1998 and page 12 of 2500 say nothing."]) == []


def test_document_order_across_lanes(spark):
    got = _rows(
        spark,
        ["decree of 1 March 1950 amended 02-10-1960 then March 4, 1971 applied."],
    )
    assert [(g[0], g[2], g[3]) for g in got] == [
        (0, "dmy_name", datetime.date(1950, 3, 1)),
        (1, "numeric", datetime.date(1960, 10, 2)),
        (2, "mdy_name", datetime.date(1971, 3, 4)),
    ]
