"""Sequential pattern mining — itertools subsequence brute-force
parity on random streams (including repeated-item patterns like a>a
and a>b>a), the order-sensitivity contract vs plain itemsets, and the
Apriori consistency invariant."""

from __future__ import annotations

import random
from collections import defaultdict

from spanluke_spark.etl.seqmine import frequent_sequences


def _contains_subseq(stream, pat):
    it = iter(stream)
    return all(any(x == want for x in it) for want in pat)


def _py_freq(streams, s):
    items = sorted({i for st in streams.values() for i in st})
    out = {}
    for a in items:
        sup = sum(1 for st in streams.values() if _contains_subseq(st, (a,)))
        if sup >= s:
            out[(1, a)] = sup
    for a in items:
        for b in items:
            sup = sum(
                1 for st in streams.values() if _contains_subseq(st, (a, b))
            )
            if sup >= s:
                out[(2, f"{a}>{b}")] = sup
    for a in items:
        for b in items:
            if (2, f"{a}>{b}") not in out:
                continue
            for c in items:
                if (2, f"{b}>{c}") not in out:
                    continue
                sup = sum(
                    1
                    for st in streams.values()
                    if _contains_subseq(st, (a, b, c))
                )
                if sup >= s:
                    out[(3, f"{a}>{b}>{c}")] = sup
    return out


def _spark_freq(spark, streams, s, **kw):
    rows = [
        (u, t, item)
        for u, st in streams.items()
        for t, item in enumerate(st)
    ]
    df = spark.createDataFrame(rows, "user: long, ts: long, item: string")
    return {
        (r["size"], r["sequence"]): r["support"]
        for r in frequent_sequences(df, min_support=s, **kw).collect()
    }


def _rand_streams(seed, n_users, lo, hi, alphabet=4):
    rng = random.Random(seed)
    return {
        u: [f"x{rng.randrange(alphabet)}" for _ in range(rng.randrange(lo, hi))]
        for u in range(n_users)
    }


def test_matches_bruteforce(spark):
    reached3 = False
    for seed in (1, 8):
        streams = _rand_streams(seed, 20, 3, 10)
        got = _spark_freq(spark, streams, 6)
        want = _py_freq(streams, 6)
        assert got == want, seed
        reached3 = reached3 or any(k[0] == 3 for k in got)
    assert reached3, "at least one instance must reach length 3"


def test_repeated_item_patterns(spark):
    streams = {u: ["a", "a", "a"] for u in range(5)}
    streams.update({u: ["a"] for u in range(5, 8)})
    got = _spark_freq(spark, streams, 5)
    assert got[(2, "a>a")] == 5 and got[(3, "a>a>a")] == 5
    assert got[(1, "a")] == 8


def test_order_sensitivity(spark):
    streams = {u: ["a", "b"] for u in range(6)}
    got = _spark_freq(spark, streams, 6)
    assert (2, "a>b") in got and (2, "b>a") not in got


def test_max_len_truncation(spark):
    streams = _rand_streams(3, 10, 3, 7)
    got = _spark_freq(spark, streams, 3, max_len=2)
    assert got and all(k[0] <= 2 for k in got)
