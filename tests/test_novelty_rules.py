"""Batch-3 session-11 lanes: snapshot novelty (Python replay parity,
first-snapshot-100% anchor, monotone-overlap property, short-text guard),
sameAs hairball audit (planted cross-type chain flagged, clean mirrors
not), inverse-rule mining (planted inverse/symmetric/none ranking)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from spanluke_spark.graph.audit import sameas_hairballs
from spanluke_spark.graph.rules import mine_inverse_rules
from spanluke_spark.textops.novelty import snapshot_novelty


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_novelty(docs, k=3):
    sg = set()
    for s, text in docs:
        words = text.split(" ")
        for i in range(len(words) - k + 1):
            sg.add((s, _h60(" ".join(words[i : i + k]))))
    first = {}
    for s, g in sorted(sg):
        first.setdefault(g, s)
    out = {}
    for s in {s for s, _ in sg}:
        total = sum(1 for x, _ in sg if x == s)
        novel = sum(1 for g, fs in first.items() if fs == s)
        out[s] = (total, novel, round(novel / total, 6))
    return out


def _spark_novelty(spark, docs, k=3):
    df = spark.createDataFrame(docs, "snapshot: long, text: string")
    rows = snapshot_novelty(df, k=k).collect()
    return {
        r["snapshot"]: (r["n_grams"], r["n_novel"], r["novelty_rate"]) for r in rows
    }


DOCS = [
    (0, "a b c d e f"),
    (0, "x y z w"),
    (1, "a b c d q r s"),   # shares the a b c / b c d grams with snap 0
    (1, "fresh words only here"),
    (2, "a b c d e f"),     # fully known
]


def test_python_replay_parity(spark):
    assert _spark_novelty(spark, DOCS) == _py_novelty(DOCS)


def test_first_snapshot_fully_novel(spark):
    got = _spark_novelty(spark, DOCS)
    assert got[0][2] == 1.0


def test_known_snapshot_zero_novelty(spark):
    got = _spark_novelty(spark, DOCS)
    assert got[2] == (4, 0, 0.0)  # every gram of snap 2 seen in snap 0


def test_short_texts_produce_no_grams(spark):
    got = _spark_novelty(spark, [(0, "a b"), (1, "a b c")], k=3)
    assert 0 not in got  # 2 words < k -> no grams at all
    assert got[1] == (1, 1, 1.0)


def test_sameas_hairball_flags_cross_type_only(spark):
    edges = spark.createDataFrame(
        [(1, 101), (2, 102), (60, 61), (61, 62)], "src: long, dst: long"
    )
    types = spark.createDataFrame(
        [(1, "court"), (101, "court"), (2, "judge"), (102, "judge"),
         (60, "court"), (61, "judge"), (62, "statute")],
        "node: long, type: string",
    )
    rows = sameas_hairballs(edges, types).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["component"] == 60
    assert r["n_entities"] == 3 and r["n_types"] == 3
    assert r["types"] == ["court", "judge", "statute"]


def test_inverse_rules_planted_ranking(spark):
    rows = []
    for i in range(30):
        rows.append((f"c{i}", "cites", f"p{i % 10}"))
        if i % 5 != 0:
            rows.append((f"p{i % 10}", "cited_by", f"c{i}"))
        rows.append((f"a{i}", "same_as", f"b{i}"))
        rows.append((f"b{i}", "same_as", f"a{i}"))
        rows.append((f"c{i}", "decided_by", f"j{i % 4}"))
    t = spark.createDataFrame(rows, "subj: string, pred: string, obj: string")
    got = {
        (r["pred"], r["inv_pred"]): (r["support"], r["n_body"], r["confidence"])
        for r in mine_inverse_rules(t).collect()
    }
    assert got[("same_as", "same_as")][2] == 1.0          # perfect symmetry
    assert got[("cited_by", "cites")][2] == 1.0           # every cited_by reversed
    assert 0.7 < got[("cites", "cited_by")][2] < 1.0      # most, not all
    assert ("decided_by", "decided_by") not in got        # no inverse at all
    assert not any(p == "decided_by" for p, _ in got)


def test_inverse_rules_min_support(spark):
    t = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "a"), ("c", "p", "d")],
        "subj: string, pred: string, obj: string",
    )
    assert mine_inverse_rules(t, min_support=2).count() == 0
    got = {(r["pred"], r["inv_pred"]) for r in mine_inverse_rules(t).collect()}
    assert got == {("p", "q"), ("q", "p")}
