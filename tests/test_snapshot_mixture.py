"""Unit gates for temporal KG snapshots/diffs and mixture weighting."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_latest_snapshot_latest_wins_and_tiebreak(spark):
    from spanluke_spark.graph.snapshot import latest_snapshot

    t = spark.createDataFrame(
        [
            ("s1", "p", "old", 1), ("s1", "p", "new", 5),
            ("s2", "p", "a", 3), ("s2", "p", "b", 3),  # ts tie -> max obj
            ("s3", "q", "only", 2),
        ],
        "subj string, pred string, obj string, warc_ts long",
    )
    got = {(r["subj"], r["pred"]): (r["obj"], r["warc_ts"])
           for r in latest_snapshot(t).collect()}
    assert got == {("s1", "p"): ("new", 5), ("s2", "p"): ("b", 3),
                   ("s3", "q"): ("only", 2)}


def test_snapshot_diff_statuses(spark):
    from spanluke_spark.graph.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [("s1", "p", "v1"), ("s2", "p", "same"), ("s3", "p", "gone")],
        "subj string, pred string, obj string",
    )
    new = spark.createDataFrame(
        [("s1", "p", "v2"), ("s2", "p", "same"), ("s4", "p", "fresh")],
        "subj string, pred string, obj string",
    )
    got = {(r["subj"], r["pred"]): (r["old_obj"], r["new_obj"], r["status"])
           for r in snapshot_diff(old, new).collect()}
    assert got == {
        ("s1", "p"): ("v1", "v2", "changed"),
        ("s3", "p"): ("gone", None, "removed"),
        ("s4", "p"): (None, "fresh", "added"),
    }  # s2 unchanged -> dropped


def test_mixture_weights_math_and_cap(spark):
    from spanluke_spark.textops.mixture import mixture_weights

    # head source 900 tokens, tail 100: alpha=0.5 flattens 9:1 -> 3:1
    docs = spark.createDataFrame(
        [(i, "head", 9) for i in range(100)] + [(i + 100, "tail", 1) for i in range(100)],
        "doc_id long, source string, n_chars long",
    )
    w = {r["source"]: r for r in mixture_weights(docs, alpha=0.5, budget_frac=0.3).collect()}
    assert w["head"]["n_tokens"] == 900 and w["tail"]["n_tokens"] == 100
    assert w["head"]["share"] == pytest.approx(0.9)
    z = math.sqrt(0.9) + math.sqrt(0.1)
    assert w["head"]["temp_share"] == pytest.approx(math.sqrt(0.9) / z)
    assert w["tail"]["temp_share"] == pytest.approx(math.sqrt(0.1) / z)
    # head rate: 0.3*1000*temp/900 < 1; tail: 0.3*1000*0.25/100 would be
    # 0.75 -> uncapped; with budget_frac 4.0 the tail caps at 1.0
    assert w["head"]["rate"] == pytest.approx(300 * (math.sqrt(0.9) / z) / 900)
    w4 = {r["source"]: r["rate"]
          for r in mixture_weights(docs, alpha=0.5, budget_frac=4.0).collect()}
    assert w4["tail"] == 1.0  # capped


def test_mixture_sample_deterministic_and_rate_accurate(spark):
    from spanluke_spark.textops.mixture import mixture_sample, mixture_weights

    docs = spark.createDataFrame(
        [(i, "a", 1) for i in range(2000)] + [(i + 2000, "b", 1) for i in range(2000)],
        "doc_id long, source string, n_chars long",
    )
    w = mixture_weights(docs, alpha=1.0, budget_frac=0.5)  # rate 0.5 each
    s1 = sorted(r["doc_id"] for r in mixture_sample(docs, w, salt="t").collect())
    s2 = sorted(r["doc_id"] for r in mixture_sample(docs, w, salt="t").collect())
    assert s1 == s2  # replay-identical
    assert 0.45 * 4000 < len(s1) < 0.55 * 4000  # rate-accurate
    s3 = sorted(r["doc_id"] for r in mixture_sample(docs, w, salt="u").collect())
    assert s1 != s3  # salt actually keys the decision
