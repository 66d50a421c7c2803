"""Redirect-chain resolution, host boilerplate removal, weighted
per-group sampling."""

from __future__ import annotations

import math

import pytest

from spanluke_spark.etl.redirects import resolve_redirects
from spanluke_spark.textops.boilerplate import (
    boilerplate_lines,
    strip_boilerplate,
)
from spanluke_spark.textops.sampling import weighted_sample_per_group


def test_redirects_chain_and_terminal(spark):
    # chain a->b->c->d (d terminal), plus e->d
    r = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d")],
        "src string, dst string",
    )
    out = {x.src: (x.final, x.hops, x.is_cycle)
           for x in resolve_redirects(r).collect()}
    assert out == {
        "a": ("d", 3, False),
        "b": ("d", 2, False),
        "c": ("d", 1, False),
        "e": ("d", 1, False),
    }


def test_redirects_cycle_flagged(spark):
    # x<->y loop, plus w feeding the loop, plus a normal chain
    r = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("w", "x"), ("a", "b")],
        "src string, dst string",
    )
    out = {x.src: (x.hops, x.is_cycle)
           for x in resolve_redirects(r, max_rounds=6).collect()}
    assert out["a"] == (1, False)
    for n in ("x", "y", "w"):
        assert out[n][1] is True and out[n][0] is None


def test_redirects_duplicate_edges_min_dst(spark):
    r = spark.createDataFrame(
        [("a", "c"), ("a", "b")], "src string, dst string"
    )
    row = resolve_redirects(r).collect()[0]
    assert (row.src, row.final) == ("a", "b")


def test_redirects_long_chain_log_rounds(spark):
    # 40-link chain resolves within 6 doubling rounds (2^6 = 64 >= 40)
    r = spark.createDataFrame(
        [(f"n{i}", f"n{i+1}") for i in range(40)], "src string, dst string"
    )
    out = {x.src: (x.final, x.hops) for x in
           resolve_redirects(r, max_rounds=6).collect()}
    assert out["n0"] == ("n40", 40)
    assert out["n39"] == ("n40", 1)


_PAGES_SCHEMA = "host string, doc_id long, text string"


def _pages(spark):
    rows = []
    for d in range(6):
        body = f"unique body {d}"
        rows.append(("h1", d, f"MENU h1\n{body}\nCOPYRIGHT h1"))
    rows.append(("h2", 100, "MENU h2\nsolo page"))  # 1 page: min_pages guard
    return spark.createDataFrame(rows, _PAGES_SCHEMA)


def test_boilerplate_lines_detected(spark):
    bp = boilerplate_lines(_pages(spark)).collect()
    got = {(r.host, r.line): r.n_pages for r in bp}
    assert got == {("h1", "MENU h1"): 6, ("h1", "COPYRIGHT h1"): 6}


def test_strip_boilerplate_keeps_body(spark):
    out = {r.page_id: (r.clean_text, r.n_removed)
           for r in strip_boilerplate(_pages(spark)).collect()}
    for d in range(6):
        assert out[d] == (f"unique body {d}", 2)
    assert out[100] == ("MENU h2\nsolo page", 0)


def test_strip_boilerplate_all_boilerplate_page(spark):
    rows = [("h", i, "SAME\nSAME2") for i in range(3)]
    df = spark.createDataFrame(rows, _PAGES_SCHEMA)
    out = strip_boilerplate(df).collect()
    assert all(r.clean_text == "" and r.n_removed == 2 for r in out)


def test_weighted_sample_deterministic_and_sized(spark):
    rows = [(f"g{i % 3}", i, float(1 + i % 5)) for i in range(300)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, w double")
    a = {r.doc_id for r in
         weighted_sample_per_group(df, 10, "w").collect()}
    b = {r.doc_id for r in
         weighted_sample_per_group(df, 10, "w").collect()}
    assert a == b and len(a) == 30
    c = {r.doc_id for r in
         weighted_sample_per_group(df, 10, "w", salt="other").collect()}
    assert a != c


def test_weighted_sample_matches_python_reference(spark):
    from spanluke_spark.textops.sampling import _BUCKETS
    import hashlib

    rows = [("g", i, float(1 + i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, w double")
    got = sorted(r.doc_id for r in
                 weighted_sample_per_group(df, 5, "w", salt="s").collect())

    def unit(i):
        h = int(hashlib.md5(f"s:{i}".encode()).hexdigest()[:15], 16)
        return (h % _BUCKETS + 1) / float(_BUCKETS)

    keys = sorted(
        ((math.log(unit(i)) / w, -i), i) for _, i, w in rows
    )[::-1][:5]
    assert got == sorted(i for _, i in keys)


def test_weighted_sample_bias_toward_heavy(spark):
    # two weight classes 10:1 — heavy rows must dominate the sample
    rows = [("g", i, 10.0 if i % 2 == 0 else 1.0) for i in range(2000)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, w double")
    picked = [r.doc_id for r in
              weighted_sample_per_group(df, 200, "w").collect()]
    heavy = sum(1 for i in picked if i % 2 == 0)
    assert heavy > 150  # ~10/11 expected; far above the unweighted 100
