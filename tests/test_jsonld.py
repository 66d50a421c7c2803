"""JSON-LD extraction lanes the q122 oracle corpus doesn't exercise:
multiple script blocks, bare-object and top-level-array roots, blank-node
subjects for @id-less roots, malformed blocks, key filtering, and the
depth cutoff."""

from __future__ import annotations

import pytest

from spanluke_spark.etl.jsonld import extract_jsonld_blocks, jsonld_triples


def _pages(spark, html):
    return spark.createDataFrame([("u1", html)], "url string, html string")


def _triples(spark, html):
    return {
        (r.subj, r.pred, r.obj, r.obj_kind)
        for r in jsonld_triples(_pages(spark, html)).collect()
    }


def test_multiple_blocks_and_roots(spark):
    html = (
        '<p>x</p><SCRIPT type="application/ld+json">{"@id":"a","name":"A"}</SCRIPT>'
        '<script type=\'application/ld+json\'>[{"@id":"b","n":1},{"@id":"c","n":2}]'
        "</script>"
    )
    got = _triples(spark, html)
    assert ("a", "name", "A", "literal") in got
    assert ("b", "n", "1", "literal") in got
    assert ("c", "n", "2", "literal") in got


def test_graph_wrapper_and_blank_roots(spark):
    html = (
        '<script type="application/ld+json">'
        '{"@context":"https://schema.org","@graph":[{"name":"anon"},{"@id":"x","p":"q"}]}'
        "</script>"
    )
    got = _triples(spark, html)
    # @id-less root gets a url-derived blank subject, numbered block-major
    assert ("_:u1#0", "name", "anon", "literal") in got
    assert ("x", "p", "q", "literal") in got


def test_nested_blank_and_depth_cutoff(spark):
    html = (
        '<script type="application/ld+json">'
        '{"@id":"r","inner":{"name":"n1","deep":{"z":1}},"ref":{"@id":"other"}}'
        "</script>"
    )
    got = _triples(spark, html)
    assert ("r", "inner", "r.inner[0]", "blank") in got
    assert ("r.inner[0]", "name", "n1", "literal") in got
    # depth >= 3 degrades to raw json, never silently dropped
    assert ("r.inner[0]", "deep", '{"z":1}', "raw_json") in got
    assert ("r", "ref", "other", "iri") in got


def test_type_arrays_and_scalar_arrays(spark):
    html = (
        '<script type="application/ld+json">'
        '{"@id":"t","@type":["A","B"],"tags":["x","y"]}</script>'
    )
    got = _triples(spark, html)
    assert ("t", "rdf:type", "A", "iri") in got and ("t", "rdf:type", "B", "iri") in got
    assert ("t", "tags", "x", "literal") in got and ("t", "tags", "y", "literal") in got


def test_malformed_block_and_bad_keys_skipped(spark):
    html = (
        '<script type="application/ld+json">not json at all</script>'
        '<script type="application/ld+json">{"@id":"k","ok":"v","ba[d":"w"}</script>'
    )
    got = _triples(spark, html)
    assert ("k", "ok", "v", "literal") in got
    # path-breaking key filtered rather than corrupting the row
    assert not any(p == "ba[d" for (_, p, _, _) in got)
    # the malformed block contributes no node
    nodes = extract_jsonld_blocks(_pages(spark, html)).collect()
    assert len(nodes) == 1


def test_no_jsonld_no_rows_and_other_scripts_ignored(spark):
    html = '<script type="text/javascript">{"@id":"evil"}</script><p>hi</p>'
    assert _triples(spark, html) == set()
