"""Allen interval relations — Python brute-force parity on random
intervals with ALL 13 relations exercised, the partition property
(exactly one relation per pair), and inverse-name consistency."""

from __future__ import annotations

import random

from spanluke_spark.graph.intervals import ALLEN_RELATIONS, allen_relations

_INVERSE = {
    "before": "after",
    "meets": "met_by",
    "overlaps": "overlapped_by",
    "starts": "started_by",
    "during": "contains",
    "finishes": "finished_by",
    "equals": "equals",
}
_INVERSE.update({v: k for k, v in _INVERSE.items()})


def _py_allen(sa, ea, sb, eb):
    if sa == sb and ea == eb:
        return "equals"
    if ea < sb:
        return "before"
    if eb < sa:
        return "after"
    if ea == sb:
        return "meets"
    if eb == sa:
        return "met_by"
    if sa == sb:
        return "starts" if ea < eb else "started_by"
    if ea == eb:
        return "finishes" if sa > sb else "finished_by"
    if sa > sb and ea < eb:
        return "during"
    if sa < sb and ea > eb:
        return "contains"
    return "overlaps" if sa < sb else "overlapped_by"


def _facts(seed: int, n: int, keys: int, span: int):
    rng = random.Random(seed)
    out = []
    for fid in range(n):
        s = rng.randrange(span)
        out.append((f"k{fid % keys}", fid, s, s + rng.randrange(1, 6)))
    return out


def test_matches_bruteforce_and_hits_all_13(spark):
    facts = _facts(3, 400, 8, 12)
    df = spark.createDataFrame(
        facts, "subj: string, fact_id: long, start: long, end: long"
    )
    got = {
        (r["key"], r["id_a"], r["id_b"]): r["relation"]
        for r in allen_relations(df).collect()
    }
    by_key: dict[str, list] = {}
    for k, fid, s, e in facts:
        by_key.setdefault(k, []).append((fid, s, e))
    want = {}
    for k, items in by_key.items():
        for i, (fa, sa, ea) in enumerate(items):
            for fb, sb, eb in items[i + 1 :]:
                lo, hi = min(fa, fb), max(fa, fb)
                if lo == fa:
                    want[(k, lo, hi)] = _py_allen(sa, ea, sb, eb)
                else:
                    want[(k, lo, hi)] = _py_allen(sb, eb, sa, ea)
    assert got == want
    assert set(got.values()) == set(ALLEN_RELATIONS), "all 13 must occur"


def test_swapping_pair_order_gives_inverse(spark):
    facts = _facts(5, 60, 3, 10)
    df = spark.createDataFrame(
        facts, "subj: string, fact_id: long, start: long, end: long"
    )
    fwd = {
        (r["key"], r["id_a"], r["id_b"]): r["relation"]
        for r in allen_relations(df).collect()
    }
    flipped = df.selectExpr(
        "subj", "CAST(10000 - fact_id AS LONG) AS fact_id", "start", "end"
    )
    rev = {
        (r["key"], 10000 - r["id_b"], 10000 - r["id_a"]): r["relation"]
        for r in allen_relations(flipped).collect()
    }
    assert set(fwd) == set(rev)
    for key, rel in fwd.items():
        assert rev[key] == _INVERSE[rel]


def test_invalid_intervals_dropped(spark):
    df = spark.createDataFrame(
        [("k", 1, 5, 5), ("k", 2, 3, 2), ("k", 3, 0, 4), ("k", 4, 1, 3)],
        "subj: string, fact_id: long, start: long, end: long",
    )
    rows = allen_relations(df).collect()
    ids = {(r["id_a"], r["id_b"]) for r in rows}
    assert ids == {(3, 4)}
