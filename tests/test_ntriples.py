"""N-Triples sink + source: round-trip, spec-pinned lines, malformed
flagging."""

from __future__ import annotations

import pytest

from spanluke_spark.etl.ntriples import from_ntriples, to_ntriples

_BASE = "http://kg.local/"


def test_roundtrip_iris_and_literals(spark):
    rows = [
        ("c1", "decided_by", "j1", False),
        ("c1", "label", 'quote " and \\ back\nnewline', True),
        ("j1", "name", "Judge J", True),
    ]
    t = spark.createDataFrame(
        rows, "subj string, pred string, obj string, is_lit boolean"
    )
    nt = to_ntriples(t, literal_col="is_lit")
    back = from_ntriples(nt).collect()
    got = {(r.subj, r.pred, r.obj, r.is_literal) for r in back}
    assert got == {(s, p, o, l) for s, p, o, l in rows}
    assert all(not r.is_malformed for r in back)


def test_serialized_escapes_pinned(spark):
    t = spark.createDataFrame(
        [("a", "p", 'x"y\\z', True)],
        "subj string, pred string, obj string, is_lit boolean",
    )
    line = to_ntriples(t, literal_col="is_lit").collect()[0].line
    assert line == (
        '<http://kg.local/a> <http://kg.local/p> "x\\"y\\\\z" .'
    )


def test_parse_external_dump_lines(spark):
    lines = [
        "# a comment",
        "",
        '<http://ex.org/s> <http://ex.org/p> <http://ex.org/o> .',
        '<http://ex.org/s> <http://ex.org/p> "hello"@en .',
        f"<{_BASE}c1> <{_BASE}cites> <{_BASE}c2> .",
        "this is not a triple",
    ]
    df = spark.createDataFrame([(x,) for x in lines], "line string")
    rows = from_ntriples(df).collect()
    assert len(rows) == 4  # comment + blank skipped
    by_obj = {r.obj: r for r in rows if not r.is_malformed}
    # foreign IRIs kept verbatim, base stripped when it matches
    assert "http://ex.org/o" in by_obj
    assert by_obj["http://ex.org/o"].subj == "http://ex.org/s"
    assert by_obj["hello"].lang == "en" and by_obj["hello"].is_literal
    assert by_obj["c2"].subj == "c1" and by_obj["c2"].pred == "cites"
    bad = [r for r in rows if r.is_malformed]
    assert len(bad) == 1 and bad[0].subj is None


def test_malformed_fuzz_never_misparses(spark):
    import random

    rng = random.Random(7)
    chars = '<>" .\\@abc\n'
    garbage = [
        ("".join(rng.choice(chars) for _ in range(rng.randint(1, 40))),)
        for _ in range(300)
    ]
    df = spark.createDataFrame(garbage, "line string")
    rows = from_ntriples(df).collect()
    for r in rows:
        # every surviving row is either flagged or fully parsed
        if not r.is_malformed:
            assert r.subj is not None and r.pred is not None
            assert r.obj is not None


def test_roundtrip_backslash_n_sequence(spark):
    # literal backslash followed by 'n' (NOT a newline): the decode
    # order bug class — \\n must come back as backslash+n
    tricky = ["\\n", "a\\nb", "\\\\n", "\\", "end\\"]
    t = spark.createDataFrame(
        [(f"s{i}", "p", v, True) for i, v in enumerate(tricky)],
        "subj string, pred string, obj string, is_lit boolean",
    )
    back = from_ntriples(to_ntriples(t, literal_col="is_lit")).collect()
    assert {(r.subj, r.obj) for r in back} == {
        (f"s{i}", v) for i, v in enumerate(tricky)
    }
    assert all(not r.is_malformed for r in back)
