"""Incremental CC: equivalence with from-scratch CC under merges,
untouched components, brand-new nodes, and chained deltas."""

from __future__ import annotations

from spanluke_spark.canon.cc import connected_components, incremental_cc


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _labels(df):
    return {r.node: r.component for r in df.collect()}


def test_merge_two_components_and_keep_untouched(spark):
    old = _edges(spark, [(1, 2), (10, 11), (20, 21)])
    labels = connected_components(old)
    delta = _edges(spark, [(2, 10)])
    got = _labels(incremental_cc(labels, delta))
    want = _labels(connected_components(_edges(spark, [(1, 2), (10, 11), (20, 21), (2, 10)])))
    assert got == want
    assert got[20] == 20 and got[21] == 20  # untouched component unchanged


def test_new_nodes_and_new_min_id(spark):
    old = _edges(spark, [(5, 6)])
    labels = connected_components(old)
    # node 1 is BRAND NEW and smaller than the old min -> becomes the label
    delta = _edges(spark, [(1, 5), (100, 101)])
    got = _labels(incremental_cc(labels, delta))
    assert got[5] == 1 and got[6] == 1 and got[1] == 1
    assert got[100] == 100 and got[101] == 100


def test_chained_deltas_match_scratch(spark):
    old = _edges(spark, [(0, 1), (4, 5), (8, 9)])
    labels = connected_components(old)
    labels = incremental_cc(labels, _edges(spark, [(1, 4)]))
    labels = incremental_cc(labels, _edges(spark, [(5, 8), (30, 31)]))
    got = _labels(labels)
    want = _labels(
        connected_components(
            _edges(spark, [(0, 1), (4, 5), (8, 9), (1, 4), (5, 8), (30, 31)])
        )
    )
    assert got == want
