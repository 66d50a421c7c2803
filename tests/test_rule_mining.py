"""AMIE-style 2-chain rule mining."""

from __future__ import annotations

import pytest

from spanluke_spark.graph.rules import mine_chain_rules

_T = "subj string, pred string, obj string"


def test_mine_planted_rule(spark):
    triples = spark.createDataFrame(
        [
            ("c1", "decided_by", "j1"),
            ("c2", "decided_by", "j1"),
            ("c3", "decided_by", "j2"),
            ("j1", "located_in", "r1"),
            ("j2", "located_in", "r2"),
            ("c1", "jurisdiction", "r1"),
            ("c2", "jurisdiction", "r1"),
        ],
        _T,
    )
    rules = {
        (r.p1, r.p2, r.p3): (r.support, r.body_pairs, r.confidence)
        for r in mine_chain_rules(triples, min_support=2).collect()
    }
    s, b, c = rules[("decided_by", "located_in", "jurisdiction")]
    assert (s, b) == (2, 3)
    assert c == pytest.approx(2 / 3)


def test_support_counts_distinct_groundings(spark):
    # two different mid nodes ground the SAME (x, z): counted once
    triples = spark.createDataFrame(
        [
            ("x", "p", "y1"), ("x", "p", "y2"),
            ("y1", "q", "z"), ("y2", "q", "z"),
            ("x", "r", "z"), ("x2", "p", "y1"), ("x2", "r", "z2"),
        ],
        _T,
    )
    rules = {
        (r.p1, r.p2, r.p3): (r.support, r.body_pairs)
        for r in mine_chain_rules(triples, min_support=1).collect()
    }
    # body (p, q): groundings {(x, z), (x2, z)} -> 2; head r holds for (x, z)
    assert rules[("p", "q", "r")] == (1, 2)


def test_max_mid_degree_drops_hub_chains(spark):
    rows = [("x%d" % i, "p", "hub") for i in range(20)]
    rows += [("hub", "q", "z%d" % i) for i in range(20)]
    rows += [("a", "p", "m"), ("m", "q", "b"), ("a", "r", "b")]
    rows += [("a2", "p", "m"), ("m", "q", "b2"), ("a2", "r", "b2")]
    triples = spark.createDataFrame(rows, _T)
    exact = mine_chain_rules(triples, min_support=1).collect()
    capped = mine_chain_rules(
        triples, min_support=1, max_mid_degree=10
    ).collect()
    # hub chains contribute 400 body pairs exactly, none through the cap
    exact_b = {(r.p1, r.p2): r.body_pairs for r in exact}
    capped_b = {(r.p1, r.p2): r.body_pairs for r in capped}
    assert exact_b[("p", "q")] - capped_b[("p", "q")] == 400
    # the planted low-degree rule survives with identical support
    er = {(r.p1, r.p2, r.p3): r.support for r in exact}
    cr = {(r.p1, r.p2, r.p3): r.support for r in capped}
    assert er[("p", "q", "r")] == cr[("p", "q", "r")] == 2
