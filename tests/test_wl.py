"""WL refinement: isomorphic components share colors, structural roles
separate, tampering diverges, refinement is monotone."""

from __future__ import annotations

from spanluke_spark.graph.wl import wl_colors


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _colors(spark, pairs, rounds=2):
    return {r.node: r.color for r in wl_colors(_edges(spark, pairs), rounds=rounds).collect()}


def test_isomorphic_components_share_colors(spark):
    # two identical paths 0-1-2 and 10-11-12
    got = _colors(spark, [(0, 1), (1, 2), (10, 11), (11, 12)])
    assert got[0] == got[10] and got[1] == got[11] and got[2] == got[12]
    # ends vs middle differ
    assert got[0] != got[1]
    # path ends and an isolated-edge end differ after 2 rounds (their
    # 2-hop unfoldings differ) even though both have degree 1
    got2 = _colors(spark, [(0, 1), (1, 2), (20, 21)])
    assert got2[0] != got2[20]


def test_tampering_changes_colors(spark):
    base = [(0, 1), (1, 2), (2, 3)]
    twin = [(10, 11), (11, 12), (12, 13)]
    got = _colors(spark, base + twin + [(3, 0)])  # close a cycle in comp 0
    # the tampered component no longer matches its former twin anywhere
    assert got[1] != got[11] and got[0] != got[10]


def test_star_center_vs_leaves(spark):
    got = _colors(spark, [(0, i) for i in range(1, 5)])
    assert len({got[i] for i in range(1, 5)}) == 1  # leaves identical
    assert got[0] != got[1]
