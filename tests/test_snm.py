"""Sorted-neighborhood blocking — Python replay parity (global sort +
slide), cross-bucket boundary pairs (the two-phase rank must be exactly
global), window-size contract, and the plan audit: no single-partition
window over the data-sized relation."""

from __future__ import annotations

import random
import string

from spanluke_spark.link.snm import sorted_neighborhood_pairs


def _py_pairs(recs, window=3):
    order = sorted(recs, key=lambda r: (r[1], r[0]))
    out = set()
    for i, (ida, ka) in enumerate(order):
        for j in range(i + 1, min(i + window, len(order))):
            idb, kb = order[j]
            out.add((ida, idb, ka, kb, j - i))
    return out


def _spark_pairs(spark, recs, window=3, prefix_len=2):
    df = spark.createDataFrame(recs, "id: long, key: string")
    rows = sorted_neighborhood_pairs(
        df, window=window, prefix_len=prefix_len
    ).collect()
    return {
        (r["id_a"], r["id_b"], r["key_a"], r["key_b"], r["rank_gap"]) for r in rows
    }


def test_python_replay_parity(spark):
    rng = random.Random(6)
    recs = [
        (i, "".join(rng.choices(string.ascii_lowercase[:5], k=rng.randint(2, 6))))
        for i in range(80)
    ]
    for w in (2, 3, 4):
        assert _spark_pairs(spark, recs, window=w) == _py_pairs(recs, window=w), w


def test_cross_bucket_boundary_pairs(spark):
    # adjacent in the global order but in different prefix buckets
    recs = [(1, "az"), (2, "ba"), (3, "bz"), (4, "ca")]
    got = _spark_pairs(spark, recs, window=2)
    assert got == _py_pairs(recs, window=2)
    assert (1, 2, "az", "ba", 1) in got and (3, 4, "bz", "ca", 1) in got


def test_tie_break_by_id(spark):
    recs = [(9, "same"), (4, "same"), (7, "same")]
    got = _spark_pairs(spark, recs, window=2)
    assert got == {(4, 7, "same", "same", 1), (7, 9, "same", "same", 1)}


def test_window_must_be_at_least_two(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "id: long, key: string")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, window=1)


def test_plan_audit_no_full_width_unkeyed_window(spark):
    recs = [(i, f"k{i:03d}") for i in range(50)]
    df = spark.createDataFrame(recs, "id: long, key: string")
    out = sorted_neighborhood_pairs(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the data-sized window must be keyed by bucket; the only
    # SinglePartition exchange allowed is the bounded bucket-count one
    import re

    assert "partial_count" in plan  # bucket counts map-side combine
    # no window whose partition spec is empty over the keyed relation:
    # every Window node must mention the bucket column in its partition
    for m in re.finditer(r"Window \[row_number\(\)[^\n]*", plan):
        assert "_b" in m.group(0)
