"""k-anonymity / l-diversity — Counter brute-force parity, suppression
semantics (every surviving class has >= k rows), idempotence, and the
report/suppression consistency contract."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

from spanluke_spark.textops.privacy import (
    k_anonymity_report,
    suppress_small_classes,
)


def _rows(seed: int, n: int):
    rng = random.Random(seed)
    return [
        (f"z{rng.randrange(6)}", f"a{rng.randrange(3)}", f"c{rng.randrange(4)}")
        for _ in range(n)
    ]


def test_report_matches_bruteforce(spark):
    rows = _rows(1, 300)
    df = spark.createDataFrame(rows, "zip3: string, age: string, sens: string")
    got = {
        (r["zip3"], r["age"]): (
            r["class_size"],
            r["n_sensitive"],
            r["k_anonymous"],
            r["l_diverse"],
        )
        for r in k_anonymity_report(df, ["zip3", "age"], "sens", 10, 3).collect()
    }
    size = Counter((z, a) for z, a, _ in rows)
    sens = defaultdict(set)
    for z, a, s in rows:
        sens[(z, a)].add(s)
    want = {
        key: (size[key], len(sens[key]), size[key] >= 10, len(sens[key]) >= 3)
        for key in size
    }
    assert got == want


def test_suppression_enforces_k_and_is_idempotent(spark):
    rows = _rows(3, 120)
    df = spark.createDataFrame(rows, "zip3: string, age: string, sens: string")
    k = 8
    sup = suppress_small_classes(df, ["zip3", "age"], k=k)
    counts = Counter((r["zip3"], r["age"]) for r in sup.collect())
    assert counts and all(c >= k for c in counts.values())
    again = suppress_small_classes(sup, ["zip3", "age"], k=k)
    assert again.count() == sup.count()
    # exactly the rows of k-anonymous classes survive
    full = Counter((z, a) for z, a, _ in rows)
    assert sum(counts.values()) == sum(c for c in full.values() if c >= k)


def test_report_flags_agree_with_suppression(spark):
    rows = _rows(5, 200)
    df = spark.createDataFrame(rows, "zip3: string, age: string, sens: string")
    rep = k_anonymity_report(df, ["zip3", "age"], "sens", k=6)
    anon = {
        (r["zip3"], r["age"]) for r in rep.collect() if r["k_anonymous"]
    }
    sup = suppress_small_classes(df, ["zip3", "age"], k=6)
    survived = {(r["zip3"], r["age"]) for r in sup.collect()}
    assert survived == anon
