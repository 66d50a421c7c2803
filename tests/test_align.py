"""Instance-based ontology alignment (graph/align.py)."""

from __future__ import annotations

from spanluke_spark.graph.align import align_classes


def _ext(spark, rows):
    return spark.createDataFrame(rows, "cls string, inst string")


def test_perfect_and_partial_alignment(spark):
    a = _ext(
        spark,
        [("Person", x) for x in "abcd"]
        + [("City", x) for x in ("x", "y", "z")],
    )
    b = _ext(
        spark,
        [("Human", x) for x in "abcd"]  # identical extent -> jaccard 1
        + [("Town", x) for x in ("x", "y", "q")],  # 2/4 overlap
    )
    got = {
        (r.class_a, r.class_b): r
        for r in align_classes(a, b).collect()
    }
    assert got[("Person", "Human")].jaccard == 1.0
    assert got[("Person", "Human")].n_common == 4
    assert got[("City", "Town")].jaccard == 0.5
    assert len(got) == 2


def test_mutual_best_only(spark):
    # B1 overlaps A1 more than A2 does; A2's best is also B1 but B1's best
    # is A1, so A2 gets no alignment (mutual top-1 rule)
    a = _ext(
        spark,
        [("A1", x) for x in "abc"] + [("A2", x) for x in ("a", "d")],
    )
    b = _ext(spark, [("B1", x) for x in "abc"])
    got = [(r.class_a, r.class_b) for r in align_classes(a, b).collect()]
    assert got == [("A1", "B1")]


def test_min_jaccard_and_max_df(spark):
    # instance 'u' belongs to every class on both sides; with max_df=1 it
    # is dropped and the spurious all-pairs overlap disappears
    a = _ext(spark, [("A1", "u"), ("A2", "u"), ("A1", "p"), ("A2", "q")])
    b = _ext(spark, [("B1", "u"), ("B2", "u"), ("B1", "p"), ("B2", "r")])
    with_cap = align_classes(a, b, max_df=1).collect()
    assert [(r.class_a, r.class_b) for r in with_cap] == [("A1", "B1")]
    none_pass = align_classes(a, b, min_jaccard=0.9).collect()
    assert all(r.jaccard >= 0.9 for r in none_pass)
