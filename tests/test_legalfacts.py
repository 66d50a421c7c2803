"""Unified legal-fact lane union (etl/legalfacts.py)."""

from __future__ import annotations

from spanluke_spark.etl.legalfacts import legal_facts

_DOC = (
    "CORAM: HON'BLE MR. JUSTICE D.Y. CHANDRACHUD. "
    "he was convicted u/s 302/34 IPC. "
    "the matter of State of Punjab v. Baldev Singh was heard. "
    '"we allow the appeal," said Kevin Rao. '
    "order dated 25.03.2004."
)


def _facts(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        (r.subj, r.pred, r.obj, r.lane) for r in legal_facts(df).collect()
    }


def test_all_five_lanes_emit(spark):
    got = _facts(spark, [_DOC])
    assert ("doc:0", "heard_by", "d y chandrachud", "bench") in got
    assert ("doc:0", "charged_under", "IPC s.302", "statute") in got
    assert ("doc:0", "charged_under", "IPC s.34", "statute") in got
    assert (
        "doc:0",
        "cites_case",
        "state of punjab v baldev singh",
        "precedent",
    ) in got
    assert ("doc:0", "dated", "2004-03-25", "date") in got
    assert ("Kevin Rao", "stated", "we allow the appeal", "quote") in got
    # exactly these six facts, nothing spurious from lane cross-talk
    assert len(got) == 6


def test_distinct_collapses_repeats(spark):
    got = _facts(spark, ["u/s 302 IPC applies. again u/s 302 IPC applies."])
    assert got == {("doc:0", "charged_under", "IPC s.302", "statute")}


def test_invalid_date_excluded(spark):
    got = _facts(spark, ["entry 31.02.2001 is impossible."])
    assert got == set()
