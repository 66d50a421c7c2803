"""Adamic-Adar link prediction and skip-gram pair extraction: hand-computed
scores, the hub cap, and windowed pair counts."""

from __future__ import annotations

import math

import pytest

from spanluke_spark.graph.linkpred import adamic_adar, hub_capped_neighbors
from spanluke_spark.graph.walks import skipgram_pairs


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_adamic_adar_hand_computed(spark):
    # path graph 1-2-3 plus 1-4, 3-4: candidates share middles
    e = _edges(spark, [(1, 2), (2, 3), (1, 4), (3, 4)])
    got = {(r.u, r.v): (r.common, r.aa) for r in adamic_adar(e).collect()}
    # (1,3): middles 2 (deg 2) and 4 (deg 2) -> aa = 2/ln(2); edge 1-3 absent
    assert got[(1, 3)] == (2, pytest.approx(round(2 / math.log(2), 6)))
    # (2,4): middles 1 and 3, both deg 2
    assert got[(2, 4)] == (2, pytest.approx(round(2 / math.log(2), 6)))
    # existing edges never appear
    assert (1, 2) not in got and (3, 4) not in got


def test_direction_and_duplicates_ignored(spark):
    e = _edges(spark, [(1, 2), (2, 1), (2, 3), (2, 3), (3, 2)])
    got = {(r.u, r.v) for r in adamic_adar(e).collect()}
    assert got == {(1, 3)}


def test_hub_cap_drops_and_reports(spark):
    star = [(0, i) for i in range(1, 7)] + [(10, 1), (10, 2)]
    e = _edges(spark, star)
    nbr, dropped = hub_capped_neighbors(e, max_deg=3)
    assert {r.node for r in dropped.collect()} == {0}
    assert 0 not in {r.node for r in nbr.collect()}
    # the cap removes node 0 as a wedge MIDDLE (it may still be an
    # endpoint of wedges through low-degree middles)
    got = {(r.u, r.v): r.common for r in adamic_adar(e, max_deg=3).collect()}
    assert got == {(1, 2): 1, (0, 10): 2}
    # uncapped, the hub middle contributes all 15 leaf pairs
    uncapped = adamic_adar(e).count()
    assert uncapped > len(got)


def test_skipgram_window_counts(spark):
    walks = spark.createDataFrame(
        [("w", 0, 10), ("w", 1, 11), ("w", 2, 12), ("w", 3, 10)],
        "walk_id string, step int, node long",
    )
    got = {(r.center, r.context): r.cnt for r in skipgram_pairs(walks, window=1).collect()}
    # adjacent pairs only, both directions; (10,11) once via steps 0-1
    assert got[(10, 11)] == 1 and got[(11, 10)] == 1
    assert got[(12, 10)] == 1 and got[(10, 12)] == 1  # steps 2-3
    assert (10, 10) not in got  # steps 0 and 3 are outside window 1
    wide = {(r.center, r.context): r.cnt for r in skipgram_pairs(walks, window=3).collect()}
    assert wide[(10, 10)] == 2  # steps 0<->3 in both directions
