"""SPARQL-lite BGP compiler + politeness scheduler."""

from __future__ import annotations

import pytest

from spanluke_spark.etl.frontier import politeness_schedule
from spanluke_spark.graph.sparql import bgp_query

_T = "subj string, pred string, obj string"

_KG = [
    ("c1", "decided_by", "j1"),
    ("c2", "decided_by", "j1"),
    ("c3", "decided_by", "j2"),
    ("j1", "located_in", "r1"),
    ("j2", "located_in", "r2"),
    ("c1", "jurisdiction", "r1"),
    ("n1", "knows", "n1"),
    ("n1", "knows", "n2"),
]


def test_bgp_chain_join(spark):
    t = spark.createDataFrame(_KG, _T)
    rows = {
        (r.c, r.j, r.r)
        for r in bgp_query(
            t, "?c decided_by ?j . ?j located_in ?r"
        ).collect()
    }
    assert rows == {
        ("c1", "j1", "r1"), ("c2", "j1", "r1"), ("c3", "j2", "r2")
    }


def test_bgp_closed_pattern_and_literals(spark):
    t = spark.createDataFrame(_KG, _T)
    rows = {
        (r.x, r.z)
        for r in bgp_query(
            t,
            "?x decided_by ?y . ?y located_in ?z . ?x jurisdiction ?z",
        ).collect()
    }
    assert rows == {("c1", "r1")}
    lit = bgp_query(t, "?x decided_by j1").collect()
    assert {r.x for r in lit} == {"c1", "c2"}


def test_bgp_repeated_var_in_pattern(spark):
    t = spark.createDataFrame(_KG, _T)
    rows = bgp_query(t, "?x knows ?x").collect()
    assert [(r.x,) for r in rows] == [("n1",)]


def test_bgp_variable_predicate(spark):
    t = spark.createDataFrame(_KG, _T)
    rows = {
        (r.p, r.o) for r in bgp_query(t, "c1 ?p ?o").collect()
    }
    assert rows == {("decided_by", "j1"), ("jurisdiction", "r1")}


def test_bgp_disjoint_is_cross(spark):
    t = spark.createDataFrame(_KG, _T)
    n = bgp_query(t, "?a located_in ?b . ?x knows ?y").count()
    assert n == 4  # 2 located_in x 2 knows


def test_bgp_malformed_raises(spark):
    t = spark.createDataFrame(_KG, _T)
    with pytest.raises(ValueError):
        bgp_query(t, "?x decided_by")
    with pytest.raises(ValueError):
        bgp_query(t, "   ")


_F = "host string, url string, priority double, delay double"


def test_politeness_slots_and_offsets(spark):
    frontier = spark.createDataFrame(
        [
            ("h1", "u_low", 0.1, None),
            ("h1", "u_hi", 0.9, None),
            ("h1", "u_mid", 0.5, None),
            ("h2", "u_only", 0.3, 5.0),
        ],
        _F,
    )
    out = {r.url: (r.slot, r.fetch_offset_sec)
           for r in politeness_schedule(
               frontier, crawl_delay_sec=2.0, delay_col="delay"
           ).collect()}
    assert out["u_hi"] == (1, 0.0)
    assert out["u_mid"] == (2, 2.0)
    assert out["u_low"] == (3, 4.0)
    assert out["u_only"] == (1, 0.0)  # per-host delay only shifts slot>1


def test_politeness_cap_uses_window_group_limit(spark):
    rows = [("h", f"u{i:03d}", float(i % 7), None) for i in range(100)]
    frontier = spark.createDataFrame(rows, _F)
    capped = politeness_schedule(frontier, max_per_host=5)
    assert capped.count() == 5
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


def test_bgp_transitive_property_path(spark):
    t = spark.createDataFrame(
        _KG + [
            ("court", "subclass_of", "authority"),
            ("authority", "subclass_of", "org"),
            ("sc", "a", "court"),
        ],
        _T,
    )
    pairs = {
        (r.x, r.y)
        for r in bgp_query(t, "?x subclass_of+ ?y").collect()
    }
    assert pairs == {
        ("court", "authority"), ("court", "org"), ("authority", "org")
    }
    # path composed with an ordinary pattern: entailed supertypes
    sup = {
        (r.e, r.top)
        for r in bgp_query(t, "?e a ?c . ?c subclass_of+ ?top").collect()
    }
    assert sup == {("sc", "authority"), ("sc", "org")}
    with pytest.raises(ValueError):
        bgp_query(t, "?x ?p+ ?y")


def test_bgp_inverse_and_alternation_paths(spark):
    t = spark.createDataFrame(
        _KG + [
            ("a", "subclass_of", "b"),
            ("b", "part_of", "c"),
            ("c", "subclass_of", "d"),
        ],
        _T,
    )
    # inverse: ?j ^decided_by ?c binds (j, c) where c decided_by j
    inv = {(r.j, r.c) for r in bgp_query(t, "?j ^decided_by ?c").collect()}
    assert inv == {("j1", "c1"), ("j1", "c2"), ("j2", "c3")}
    # alternation without closure: either predicate matches
    alt = {(r.x, r.y) for r in bgp_query(t, "?x subclass_of|part_of ?y").collect()}
    assert ("a", "b") in alt and ("b", "c") in alt and len(alt) == 3
    # closure exists only over the UNION of the two predicates
    only_sub = {(r.x, r.y) for r in bgp_query(t, "?x subclass_of+ ?y").collect()}
    assert ("a", "d") not in only_sub
    both = {(r.x, r.y) for r in bgp_query(t, "?x subclass_of|part_of+ ?y").collect()}
    assert ("a", "d") in both and ("a", "c") in both
    # inverse of the closed union
    invc = {(r.x, r.y) for r in bgp_query(t, "?x ^subclass_of|part_of+ ?y").collect()}
    assert ("d", "a") in invc
    with pytest.raises(ValueError):
        bgp_query(t, "?x ^?p ?y")


def test_bgp_optional_left_join(spark):
    t = spark.createDataFrame(_KG, _T)
    rows = {
        (r["c"], r["j"], r["r"])
        for r in bgp_query(
            t, "?c decided_by ?j", optional=["?c jurisdiction ?r"]
        ).collect()
    }
    # c1 has a jurisdiction; c2/c3 surface with NULL (kept, not dropped)
    assert rows == {("c1", "j1", "r1"), ("c2", "j1", None), ("c3", "j2", None)}


def test_bgp_filter_comparisons(spark):
    t = spark.createDataFrame(_KG, _T)
    rows = {
        (r["c"], r["j"])
        for r in bgp_query(t, "?c decided_by ?j", filters=["?j != j1"]).collect()
    }
    assert rows == {("c3", "j2")}
    rows = {
        r["c"]
        for r in bgp_query(t, "?c decided_by ?j", filters=["?c >= c2"]).collect()
    }
    assert rows == {"c2", "c3"}  # lexicographic on the string store


def test_bgp_filter_on_unbound_optional_var_drops_row(spark):
    t = spark.createDataFrame(_KG, _T)
    rows = {
        r["c"]
        for r in bgp_query(
            t,
            "?c decided_by ?j",
            optional=["?c jurisdiction ?r"],
            filters=["?r = r1"],
        ).collect()
    }
    assert rows == {"c1"}  # NULL comparison is false, as in SPARQL


def test_bgp_optional_requires_shared_var(spark):
    t = spark.createDataFrame(_KG, _T)
    import pytest

    with pytest.raises(ValueError):
        bgp_query(t, "?c decided_by ?j", optional=["?a knows ?b"]).collect()
    with pytest.raises(ValueError):
        bgp_query(t, "?c decided_by ?j", filters=["?nope = c1"]).collect()
    with pytest.raises(ValueError):
        bgp_query(t, "?c decided_by ?j", filters=["?c ~ c1"]).collect()
