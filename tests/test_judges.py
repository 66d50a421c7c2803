"""Judge mention extraction and bench composition (etl/judges.py)."""

from __future__ import annotations

from spanluke_spark.etl.judges import bench_composition, judge_mentions


def _rows(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = judge_mentions(df).orderBy("doc_id", "idx")
    return [(r.idx, r.judge, r.judge_key) for r in out.collect()]


def test_full_honorific_chain(spark):
    got = _rows(spark, ["CORAM: HON'BLE MR. JUSTICE A.K. SIKRI presiding."])
    assert got == [(0, "A.K. SIKRI", "a k sikri")]


def test_bare_justice_same_key(spark):
    got = _rows(spark, ["per Justice AK Sikri as he then was."])
    assert got == [(0, "AK Sikri", "ak sikri")]
    # note: dotted initials "A.K." and fused "AK" differ only by spacing
    # in the key; dotted form gives "a k sikri", fused "ak sikri"


def test_coram_list_document_order(spark):
    got = _rows(
        spark,
        [
            "CORAM: HON'BLE MR. JUSTICE D.Y. CHANDRACHUD, "
            "HON'BLE MRS. JUSTICE R. BANUMATHI and HON'BLE MR. JUSTICE M.R. SHAH"
        ],
    )
    assert [g[2] for g in got] == ["d y chandrachud", "r banumathi", "m r shah"]


def test_mrs_and_dr_honorifics(spark):
    got = _rows(
        spark,
        ["before Hon'ble Mrs. Justice Indu Malhotra and Dr. Justice S. Muralidhar."],
    )
    assert [g[2] for g in got] == ["indu malhotra", "s muralidhar"]


def test_name_stops_at_lowercase(spark):
    got = _rows(spark, ["Justice Rohinton Nariman wrote the opinion."])
    assert got == [(0, "Rohinton Nariman", "rohinton nariman")]


def test_bench_composition_sorted_distinct(spark):
    df = spark.createDataFrame(
        [
            (
                0,
                "CORAM: JUSTICE B. ONE, JUSTICE A. TWO. Later Justice B. ONE "
                "observed.",
            )
        ],
        "doc_id long, text string",
    )
    b = bench_composition(judge_mentions(df)).collect()[0]
    assert b.n_judges == 2
    assert b.bench == ["a two", "b one"]


def test_no_mention_no_rows(spark):
    assert _rows(spark, ["the court held that justice delayed is denied"]) == []
