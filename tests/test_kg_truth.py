"""Truth discovery, fact validity intervals, RDFS entailment."""

from __future__ import annotations

import pytest

from spanluke_spark.graph.entailment import rdfs_entail
from spanluke_spark.graph.snapshot import validity_intervals
from spanluke_spark.graph.truth import truth_discovery


def test_truth_discovery_hand_computed(spark):
    claims = spark.createDataFrame(
        [
            ("A", "e1", "born", "1970"),
            ("B", "e1", "born", "1970"),
            ("C", "e1", "born", "1980"),
            ("A", "e2", "cap", "paris"),
            ("C", "e2", "cap", "rome"),
            ("A", "e2", "cap", "paris"),  # duplicate assertion: one vote
        ],
        "source string, subj string, pred string, obj string",
    )
    facts, trust = truth_discovery(claims, rounds=2)
    f = {(r.subj, r.pred): r for r in facts.collect()}
    # round 1 beliefs: 1970 2/3, 1980 1/3, paris 1/2, rome 1/2
    # trust: A 7/12, B 2/3, C 5/12
    # round 2: 1970 (7/12+2/3)/(...+5/12)=0.75; paris (7/12)/(12/12)
    assert f[("e1", "born")].obj == "1970"
    assert f[("e1", "born")].belief == pytest.approx(0.75)
    assert f[("e1", "born")].n_sources == 2
    assert f[("e2", "cap")].obj == "paris"
    assert f[("e2", "cap")].belief == pytest.approx(7 / 12)
    t = {r.source: r.trust for r in trust.collect()}
    # final trust = avg of round-2 beliefs over each source's claims
    assert t["B"] == pytest.approx(0.75)
    assert t["A"] == pytest.approx((0.75 + 7 / 12) / 2)
    assert t["C"] == pytest.approx((0.25 + 5 / 12) / 2)


def test_truth_discovery_tie_breaks_by_max_obj(spark):
    claims = spark.createDataFrame(
        [("A", "s", "p", "x"), ("B", "s", "p", "z"), ("C", "s", "p", "m")],
        "source string, subj string, pred string, obj string",
    )
    facts, _ = truth_discovery(claims, rounds=1)
    row = facts.collect()[0]
    assert row.obj == "z" and row.n_sources == 1


def test_truth_discovery_beliefs_are_probabilities(spark):
    rows = [
        (f"src{i % 7}", f"s{i % 13}", "p", f"o{(i * 3) % 5}")
        for i in range(200)
    ]
    claims = spark.createDataFrame(
        rows, "source string, subj string, pred string, obj string"
    )
    facts, trust = truth_discovery(claims, rounds=3)
    assert facts.count() == 13  # one resolved fact per (subj, pred)
    for r in trust.collect():
        assert 0.0 <= r.trust <= 1.0 + 1e-12
    for r in facts.collect():
        assert 0.0 < r.belief <= 1.0 + 1e-12


def test_validity_intervals_islands(spark):
    obs = spark.createDataFrame(
        [
            ("s", "p", "x", 1),
            ("s", "p", "x", 2),
            ("s", "p", "y", 3),
            ("s", "p", "x", 4),
            ("s", "p", "x", 5),
            ("t", "p", "z", 9),
        ],
        "subj string, pred string, obj string, warc_ts long",
    )
    out = sorted(
        (r.subj, r.obj, r.valid_from, r.valid_to, r.n_obs)
        for r in validity_intervals(obs).collect()
    )
    assert out == [
        ("s", "x", 1, 2, 2),
        ("s", "x", 4, 5, 2),
        ("s", "y", 3, 3, 1),
        ("t", "z", 9, 9, 1),
    ]


def test_validity_intervals_ts_tie_deterministic(spark):
    # two objs at the same ts: obj order breaks the tie, so the island
    # split is a pure function of the input SET (arrival order ignored)
    rows = [("s", "p", "b", 1), ("s", "p", "a", 1), ("s", "p", "b", 2)]
    for perm in (rows, rows[::-1]):
        obs = spark.createDataFrame(
            perm, "subj string, pred string, obj string, warc_ts long"
        )
        out = sorted(
            (r.obj, r.valid_from, r.valid_to)
            for r in validity_intervals(obs).collect()
        )
        assert out == [("a", 1, 1), ("b", 1, 2)]


_ONTOLOGY = [
    ("court", "subclass_of", "authority"),
    ("authority", "subclass_of", "org"),
    ("decided_by", "subproperty_of", "involves"),
    ("decided_by", "domain", "case"),
    ("decided_by", "range", "court"),
]


def test_rdfs_entail_closure(spark):
    onto = spark.createDataFrame(
        _ONTOLOGY, "subj string, pred string, obj string"
    )
    triples = spark.createDataFrame(
        [("c1", "decided_by", "sc"), ("sc", "a", "court")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.subj, r.pred, r.obj) for r in rdfs_entail(triples, onto).collect()
    }
    assert got == {
        ("c1", "decided_by", "sc"),
        ("c1", "involves", "sc"),      # rdfs7
        ("c1", "a", "case"),           # rdfs2 (domain)
        ("sc", "a", "court"),
        ("sc", "a", "authority"),      # rdfs9 via rdfs11 closure
        ("sc", "a", "org"),
    }


def test_rdfs_entail_no_ontology_is_identity(spark):
    onto = spark.createDataFrame(
        [], "subj string, pred string, obj string"
    )
    triples = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c")],
        "subj string, pred string, obj string",
    )
    got = {
        (r.subj, r.pred, r.obj) for r in rdfs_entail(triples, onto).collect()
    }
    assert got == {("a", "p", "b"), ("b", "q", "c")}
