"""Unit gates for the KG-quality batch: citation extraction/authority,
constraint audit, distant supervision, co-occurrence PMI."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_extract_citations_regex(spark):
    from spanluke_spark.graph.citations import extract_citations

    docs = spark.createDataFrame(
        [
            (1, "As held in 410 U.S. 113 and 384 U.S. 436, but see 12 F.3d 99."),
            (2, "No citations here, just 42 pages of dicta."),
            (3, "98 S.Ct. 2733; 410 U.S. 113 again; 5 F. Supp. 271."),
        ],
        "doc_id long, text string",
    )
    got = sorted(map(tuple, extract_citations(docs).collect()))
    assert got == [
        (1, "12 F.3d 99"),
        (1, "384 U.S. 436"),
        (1, "410 U.S. 113"),
        (3, "410 U.S. 113"),
        (3, "5 F. Supp. 271"),
        (3, "98 S.Ct. 2733"),
    ]


def test_citation_authority_dense_rank_no_global_window(spark):
    from spanluke_spark.graph.citations import citation_authority

    # duplicate occurrences within one doc count once
    cites = spark.createDataFrame(
        [(1, "A"), (1, "A"), (2, "A"), (3, "A"), (1, "B"), (2, "B"), (1, "C"),
         (2, "C"), (3, "D")],
        "doc_id long, citation string",
    )
    out = {r["citation"]: (r["n_citing_docs"], r["auth_rank"])
           for r in citation_authority(cites).collect()}
    assert out == {"A": (3, 1), "B": (2, 2), "C": (2, 2), "D": (1, 3)}
    # the only window in the plan runs over the tiny distinct-count set,
    # joined back via broadcast — no Exchange SinglePartition feeding a
    # full-width window
    plan = citation_authority(cites)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_functional_violations_bounded_evidence(spark):
    from spanluke_spark.graph.audit import functional_violations

    rows = (
        [("s1", "decided_on", "o%d" % i) for i in range(10)]
        + [("s2", "decided_on", "oX")] * 3          # single value: no violation
        + [("s1", "cites", "o1"), ("s1", "cites", "o2")]  # non-functional pred
        + [("s3", "judge", "j1"), ("s3", "judge", "j2")]
    )
    t = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {(r["subj"], r["pred"]): (r["n_values"], r["sample_values"])
           for r in functional_violations(t, ["decided_on", "judge"], 3).collect()}
    assert got == {
        ("s1", "decided_on"): (10, ["o0", "o1", "o2"]),  # capped at 3
        ("s3", "judge"): (2, ["j1", "j2"]),
    }


def test_predicate_stats_profile(spark):
    from spanluke_spark.graph.audit import predicate_stats

    t = spark.createDataFrame(
        [("s1", "p", "a"), ("s1", "p", "b"), ("s1", "p", "a"), ("s2", "p", "a"),
         ("s1", "q", "z")],
        "subj string, pred string, obj string",
    )
    got = {r["pred"]: r for r in predicate_stats(t).collect()}
    assert got["p"]["n_triples"] == 4
    assert got["p"]["n_subjects"] == 2 and got["p"]["n_objects"] == 2
    assert got["p"]["avg_objs_per_subject"] == pytest.approx(1.5)  # 3 pairs / 2 subj
    assert got["q"]["avg_objs_per_subject"] == pytest.approx(1.0)


def test_distant_supervision_token_boundaries(spark):
    from spanluke_spark.link.distant import distant_supervision_candidates

    docs = spark.createDataFrame(
        [
            (1, "the spark engine runs a query fast"),
            (2, "sparkling water query"),            # 'sparkling' != token 'spark'
            (3, "spark only, no second entity"),
            (4, "big sort merge join pipeline"),     # multi-word e1
            (5, "merge sort join"),                  # words present, phrase absent
        ],
        "doc_id long, text string",
    )
    kb = spark.createDataFrame(
        [("spark", "query", "executes"), ("sort merge", "join", "variant_of")],
        "e1 string, e2 string, rel string",
    )
    got = sorted(map(tuple, distant_supervision_candidates(docs, kb).collect()))
    assert got == [(1, "spark", "query", "executes"),
                   (4, "sort merge", "join", "variant_of")]


def test_distant_supervision_shuffled_path_same_result(spark):
    from spanluke_spark.link.distant import distant_supervision_candidates

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma" if i % 2 else "alpha delta") for i in range(20)],
        "doc_id long, text string",
    )
    kb = spark.createDataFrame(
        [("alpha", "beta", "r1"), ("alpha", "delta", "r2")],
        "e1 string, e2 string, rel string",
    )
    a = sorted(map(tuple, distant_supervision_candidates(docs, kb).collect()))
    b = sorted(map(tuple, distant_supervision_candidates(
        docs, kb, broadcast_threshold=1).collect()))
    assert a == b and len(a) == 20


def test_cooccurrence_pmi_values_and_cap(spark):
    from spanluke_spark.graph.cooccur import cooccurrence_pmi

    # 4 docs: (A,B) in 2, (A,C) in 1; doc 4 is an entity-stuffed outlier
    rows = (
        [(1, "A"), (1, "B"), (2, "A"), (2, "B"), (3, "A"), (3, "C")]
        + [(4, "Z%d" % i) for i in range(10)]
    )
    m = spark.createDataFrame(rows, "doc_id long, entity string")
    out = {(r["e_a"], r["e_b"]): (r["n_docs"], r["pmi"])
           for r in cooccurrence_pmi(m, max_entities_per_doc=5).collect()}
    # doc 4 dropped whole: N=3, c_A=3, c_B=2, c_C=1
    assert set(out) == {("A", "B"), ("A", "C")}
    assert out[("A", "B")][0] == 2
    assert out[("A", "B")][1] == pytest.approx(math.log(2 * 3 / (3 * 2)), abs=1e-12)
    assert out[("A", "C")][1] == pytest.approx(math.log(1 * 3 / (3 * 1)), abs=1e-12)
    # no Z pairs: the stuffed doc contributed nothing
    assert not any(k[0].startswith("Z") for k in out)


def test_cooccurrence_pmi_duplicate_mentions_once(spark):
    from spanluke_spark.graph.cooccur import cooccurrence_pmi

    m = spark.createDataFrame(
        [(1, "A"), (1, "A"), (1, "B")], "doc_id long, entity string"
    )
    rows = cooccurrence_pmi(m).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 1
