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


def test_extended_lanes(spark):
    from spanluke_spark.etl.legalfacts import legal_facts_extended

    doc = (
        "IN THE SUPREME COURT OF INDIA. Criminal Appeal No. 9 of 2001. "
        "PW-2 deposed. Acme Widgets Ltd. paid Rs. 2 lakhs. "
        "sentenced to rigorous imprisonment for 5 years. "
        "the appeal is dismissed. finally the appeal is allowed."
    )
    df = spark.createDataFrame([(7, doc)], "doc_id long, text string")
    got = {
        (r.pred, r.obj, r.lane) for r in legal_facts_extended(df).collect()
    }
    assert ("heard_in", "supreme court of india", "court") in got
    assert ("docketed_as", "criminalappeal:9:2001", "docket") in got
    assert ("heard_witness", "prosecution:2", "witness") in got
    assert ("mentions_org", "acme widgets ltd", "org") in got
    assert ("awards", "INR:200000.00", "money") in got
    assert ("sentenced_to", "rigorous:60", "penalty") in got
    # operative outcome is the LAST disposition
    assert ("disposed_as", "allowed", "outcome") in got
    assert ("disposed_as", "dismissed", "outcome") not in got


def test_onepass_matches_extended(spark):
    from spanluke_spark.etl.legalfacts import (
        legal_facts_extended,
        legal_facts_onepass,
    )

    docs = [
        "IN THE SUPREME COURT OF INDIA. Criminal Appeal No. 9 of 2001. "
        "CORAM: HON'BLE MR. JUSTICE D.Y. CHANDRACHUD. "
        "he was convicted u/s 302/34 IPC and Article 21 of the Constitution. "
        "the matter of State of Punjab v. Baldev Singh was heard. "
        '"we allow the appeal," said Kevin Rao. PW-2 deposed; DW 3 denied. '
        "Acme Widgets Pvt. Ltd. paid Rs. 2 lakhs and $5 million. "
        "sentenced to rigorous imprisonment for 5 years and simple "
        "imprisonment of 45 days. order dated 25.03.2004 and on "
        "5th January, 1998. the appeal was dismissed. the appeal is allowed.",
        "no legal content at all in this document",
        "only a date 31.02.2001 that is invalid and a quote-less sentence.",
        'relied upon in Roe v. Wade. "short," said Jo Kim. FIR No. 3/2004.',
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    a = {
        tuple(r) for r in legal_facts_extended(df).collect()
    }
    b = {
        tuple(r) for r in legal_facts_onepass(df).collect()
    }
    assert a == b
    assert len(a) > 15  # the rich doc alone yields a full lane spread
