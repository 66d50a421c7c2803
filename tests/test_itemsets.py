"""Apriori frequent itemsets — itertools brute-force parity on random
baskets, the anti-monotone support invariant, the max_basket cap
contract, and max_size truncation."""

from __future__ import annotations

import random
from collections import Counter
from itertools import combinations

import pytest

from spanluke_spark.textops.itemsets import frequent_itemsets


def _py_frequent(baskets: dict[int, set[str]], s: int, max_basket=10**9):
    l1 = Counter()
    for items in baskets.values():
        for i in items:
            l1[i] += 1
    freq1 = {i for i, c in l1.items() if c >= s}
    out = {(1, i): c for i, c in l1.items() if c >= s}
    counts2: Counter = Counter()
    counts3: Counter = Counter()
    for items in baskets.values():
        kept = sorted(i for i in items if i in freq1)
        if len(kept) > max_basket:
            continue
        for pair in combinations(kept, 2):
            counts2[pair] += 1
    freq2 = {p for p, c in counts2.items() if c >= s}
    for items in baskets.values():
        kept = sorted(i for i in items if i in freq1)
        if len(kept) > max_basket:
            continue
        for tri in combinations(kept, 3):
            if all(p in freq2 for p in combinations(tri, 2)):
                counts3[tri] += 1
    for p, c in counts2.items():
        if c >= s:
            out[(2, "|".join(p))] = c
    for t, c in counts3.items():
        if c >= s:
            out[(3, "|".join(t))] = c
    return out


def _rand_baskets(seed: int, n: int, universe: int, lo: int, hi: int):
    rng = random.Random(seed)
    return {
        bid: {
            f"i{rng.randrange(universe)}"
            for _ in range(rng.randrange(lo, hi))
        }
        for bid in range(n)
    }


def _spark_itemsets(spark, baskets, s, **kw):
    rows = [(b, i) for b, items in baskets.items() for i in items]
    df = spark.createDataFrame(rows, "basket: long, item: string")
    res = frequent_itemsets(df, min_support=s, **kw)
    return {
        (r["size"], r["itemset"]): r["support"] for r in res.collect()
    }


@pytest.mark.parametrize(
    "seed,s,reach3", [(1, 3, True), (2, 4, False), (5, 2, True)]
)
def test_matches_bruteforce(spark, seed, s, reach3):
    baskets = _rand_baskets(seed, 40, 10, 2, 7)
    got = _spark_itemsets(spark, baskets, s)
    want = _py_frequent(baskets, s)
    assert got == want
    if reach3:
        assert any(k[0] == 3 for k in got), "fixture should reach size 3"


def test_anti_monotone(spark):
    baskets = _rand_baskets(7, 30, 8, 2, 6)
    got = _spark_itemsets(spark, baskets, 3)
    sup = dict(got)
    for (size, itemset), c in got.items():
        if size >= 2:
            for sub in combinations(itemset.split("|"), size - 1):
                assert sup[(size - 1, "|".join(sub))] >= c


def test_max_basket_cap_drops_whole_basket(spark):
    baskets = _rand_baskets(9, 25, 6, 2, 5)
    baskets[99] = {f"i{j}" for j in range(6)}  # pathological basket
    got = _spark_itemsets(spark, baskets, 2, max_basket=4)
    want = _py_frequent(baskets, 2, max_basket=4)
    assert got == want


def test_max_size_truncation(spark):
    baskets = _rand_baskets(11, 20, 6, 2, 5)
    got = _spark_itemsets(spark, baskets, 2, max_size=1)
    assert got and all(k[0] == 1 for k in got)
    with pytest.raises(ValueError):
        _spark_itemsets(spark, baskets, 2, max_size=4)
