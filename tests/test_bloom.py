"""Deterministic Bloom-filter semi-join (storage/bloom.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spanluke_spark.storage.bloom import bloom_semi_join, build_bloom_relation


def _py_positions(key, m, k):
    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    s = str(key)
    h1 = h(s) % m
    h2 = (h(s + "#2") % (m - 1)) + 1
    return [(h1 + i * h2) % m for i in range(k)]


def test_no_false_negatives_and_python_parity(spark):
    filt = spark.createDataFrame([(i,) for i in range(0, 50)], "key long")
    probe = spark.createDataFrame([(i,) for i in range(0, 200)], "key long")
    m, k = 101, 3
    got = {
        r.key for r in bloom_semi_join(probe, filt, "key", "key", m=m, k=k).collect()
    }
    # every true member passes
    assert set(range(50)) <= got
    # python replay of the double-hash membership agrees exactly
    slots = set()
    for i in range(50):
        slots.update(_py_positions(i, m, k))
    want = {
        i for i in range(200) if all(p in slots for p in _py_positions(i, m, k))
    }
    assert got == want
    # the tiny filter genuinely rejects most non-members here
    assert len(got) < 200


def test_relation_bounded_by_m(spark):
    filt = spark.createDataFrame([(i,) for i in range(1000)], "key long")
    m = 64
    rel = build_bloom_relation(filt, "key", m=m, k=3)
    rows = rel.collect()
    assert len(rows) <= m
    assert all(0 <= r.pos < m for r in rows)


def test_probe_columns_pass_through(spark):
    filt = spark.createDataFrame([(1,)], "key long")
    probe = spark.createDataFrame([(1, "a"), (999999, "b")], "key long, v string")
    out = bloom_semi_join(probe, filt, "key", "key", m=4096, k=4)
    rows = out.collect()
    assert out.columns == ["key", "v"]
    assert ("a") in {r.v for r in rows}
