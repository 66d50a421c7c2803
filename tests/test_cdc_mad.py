"""CDC chunking invariants and MAD outlier semantics."""

from __future__ import annotations

from collections import defaultdict

from spanluke_spark.textops.chunking import content_defined_chunks
from spanluke_spark.textops.profile import mad_outliers


def test_cdc_partition_invariants_and_realignment(spark):
    body = "the quick brown fox jumps over the lazy dog " * 12
    shifted = "INSERTED PREFIX " + body
    df = spark.createDataFrame(
        [(1, body), (2, shifted)], "doc_id long, text string"
    )
    rows = content_defined_chunks(df, window=16, mask_bits=4).collect()
    by_doc = defaultdict(list)
    for r in rows:
        by_doc[r.doc_id].append(r)
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.chunk_idx)
        assert rs[0].start == 0
        assert all(r.length > 0 for r in rs)
        # chunks tile the document exactly
        for a, b in zip(rs, rs[1:]):
            assert a.start + a.length == b.start
    # content-defined property: after the prefix insertion, later chunk
    # HASHES re-align (most of doc 1's chunk hashes reappear in doc 2)
    h1 = [r.chunk_hash for r in by_doc[1]]
    h2 = set(r.chunk_hash for r in by_doc[2])
    shared = sum(1 for h in h1 if h in h2)
    assert shared >= len(h1) - 2


def test_cdc_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "tiny")], "doc_id long, text string")
    rows = content_defined_chunks(df, window=16, mask_bits=4).collect()
    assert len(rows) == 1 and rows[0].start == 0 and rows[0].length == 4


def test_mad_outliers_flag_planted_spike(spark):
    rows = [(i, "h", 100.0) for i in range(20)] + [(99, "h", 1000.0)]
    df = spark.createDataFrame(rows, "doc_id long, host string, bytes double")
    got = {r.doc_id: r for r in mad_outliers(df, "host", "bytes").collect()}
    # MAD of an all-100 group (plus one spike) is 0 -> spike flags
    assert got[99].is_outlier and got[99].med == 100.0 and got[99].mad == 0.0
    assert not got[0].is_outlier


def test_mad_robust_to_single_outlier(spark):
    # mean/stddev would move with the spike; median/MAD must not
    rows = [(i, "h", float(100 + (i % 5))) for i in range(50)] + [(99, "h", 1e6)]
    df = spark.createDataFrame(rows, "doc_id long, host string, bytes double")
    got = {r.doc_id: r for r in mad_outliers(df, "host", "bytes").collect()}
    assert got[99].is_outlier
    assert sum(1 for r in got.values() if r.is_outlier) <= 2
