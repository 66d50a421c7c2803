"""Quantile normalization — Python ntile replay parity (including the
SQL-standard remainder-to-early-buckets rule on uneven sizes), the
cross-source comparability property (per-bin normalized values are
identical across sources), and monotonicity within source."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from spanluke_spark.textops.quantile_norm import quantile_normalize


def _py_ntile(items, n):
    """items sorted; SQL ntile: first (len % n) buckets get one extra."""
    m = len(items)
    base, extra = divmod(m, n)
    out = {}
    ix = 0
    for b in range(1, n + 1):
        size = base + (1 if b <= extra else 0)
        for _ in range(size):
            out[items[ix]] = b
            ix += 1
    return out


def _py_qnorm(rows, n_bins):
    by_src = defaultdict(list)
    for src, rid, s in rows:
        by_src[src].append((s, rid))
    bins = {}
    for src, items in by_src.items():
        items.sort()
        for (s, rid), b in _py_ntile(items, n_bins).items():
            bins[(src, rid)] = b
    ref = defaultdict(list)
    scores = {(src, rid): s for src, rid, s in rows}
    for key, b in bins.items():
        ref[b].append(scores[key])
    refv = {b: round(sum(v) / len(v), 6) for b, v in ref.items()}
    return {key: (b, refv[b]) for key, b in bins.items()}


def _spark_qnorm(spark, rows, n_bins=5):
    df = spark.createDataFrame(
        rows, "source: string, doc_id: long, score: double"
    )
    return {
        (r["source"], r["doc_id"]): (r["bin"], r["score_norm"])
        for r in quantile_normalize(df, n_bins=n_bins).collect()
    }


def _rand_rows(seed):
    rng = random.Random(seed)
    rows = []
    rid = 0
    for src, scale, shift, n in (("a", 1, 0, 47), ("b", 3, 10, 31), ("c", 0.5, -2, 52)):
        for _ in range(n):
            rows.append((src, rid, float(rng.randrange(100) * scale + shift)))
            rid += 1
    return rows


def test_matches_python_replay(spark):
    rows = _rand_rows(1)
    got = _spark_qnorm(spark, rows, n_bins=5)
    want = _py_qnorm(rows, 5)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)


def test_sources_become_comparable(spark):
    rows = _rand_rows(4)
    got = _spark_qnorm(spark, rows, n_bins=4)
    per_bin = defaultdict(set)
    for (src, _), (b, v) in got.items():
        per_bin[b].add(v)
    # every source's bin-b rows share ONE normalized value
    assert all(len(vs) == 1 for vs in per_bin.values())


def test_monotone_within_source(spark):
    rows = _rand_rows(9)
    got = _spark_qnorm(spark, rows, n_bins=6)
    scores = {(s, r): sc for s, r, sc in rows}
    by_src = defaultdict(list)
    for key, (b, v) in got.items():
        by_src[key[0]].append((scores[key], key[1], v))
    for items in by_src.values():
        items.sort()
        normed = [v for _, _, v in items]
        assert normed == sorted(normed)
