"""Bow-tie decomposition on hand-built graphs with known regions."""

from __future__ import annotations

from spanluke_spark.graph.bowtie import bowtie_decomposition, pick_pivot, scc_of_pivot


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_textbook_bowtie(spark):
    # core 3-cycle {0,1,2}; IN 10->0; OUT 2->20; tendril 10->30;
    # disconnected pair 40<->41
    e = _edges(
        spark,
        [(0, 1), (1, 2), (2, 0), (10, 0), (2, 20), (10, 30), (40, 41), (41, 40)],
    )
    got = {r.node: r.region for r in bowtie_decomposition(e).collect()}
    assert got == {
        0: "CORE",
        1: "CORE",
        2: "CORE",
        10: "IN",
        20: "OUT",
        30: "OTHER",
        40: "OTHER",
        41: "OTHER",
    }
    assert {r.node for r in scc_of_pivot(e).collect()} == {0, 1, 2}


def test_pivot_rule_max_degree_min_id(spark):
    # node 1 and node 2 both have degree 2; min id wins
    e = _edges(spark, [(1, 2), (2, 1)])
    assert pick_pivot(e).collect()[0].node == 1


def test_acyclic_graph_core_is_pivot_alone(spark):
    # no cycles anywhere: CORE degenerates to the pivot itself
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    got = {r.node: r.region for r in bowtie_decomposition(e).collect()}
    # pivot is node with max degree: 0,1,2 all degree 2; min id = 0
    assert got[0] == "CORE" and got[1] == "OUT" and got[2] == "OUT"


def test_explicit_pivot_override(spark):
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    piv = _edges(spark, [(2, 2)]).select("src").withColumnRenamed("src", "node")
    got = {r.node: r.region for r in bowtie_decomposition(e, pivot=piv).collect()}
    assert got == {2: "CORE", 0: "IN", 1: "IN"}
