"""Hard-negative mining: positives and self excluded, ranking by cosine,
candidate-set injection."""

from __future__ import annotations

from spanluke_spark.link.hardneg import hard_negatives


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )


def test_excludes_self_and_positives_and_ranks(spark):
    # anchor 0 at [1,0]; 1 is the positive (identical), 2 is the hard
    # negative (close), 3 is easy (orthogonal)
    emb = _emb(
        spark,
        {0: [1.0, 0.0], 1: [1.0, 0.0], 2: [0.9, 0.4], 3: [0.0, 1.0]},
    )
    pos = spark.createDataFrame([(0, 1)], "anchor long, pos long")
    rows = hard_negatives(emb, pos, k=2).collect()
    got = [(r.cand, r.rank) for r in sorted(rows, key=lambda r: r.rank)]
    assert got == [(2, 1), (3, 2)]  # positive 1 and self 0 never appear


def test_injected_candidate_set_is_respected(spark):
    emb = _emb(spark, {0: [1.0, 0.0], 2: [0.9, 0.4], 3: [0.95, 0.1]})
    pos = spark.createDataFrame([(0, 99)], "anchor long, pos long")
    cands = spark.createDataFrame([(0, 2)], "anchor long, cand long")
    rows = hard_negatives(emb, pos, k=5, candidates=cands).collect()
    # only the supplied candidate is scored; 3 is never considered
    assert [(r.anchor, r.cand, r.rank) for r in rows] == [(0, 2, 1)]


def test_all_anchors_covered(spark):
    emb = _emb(spark, {i: [float(i + 1), 1.0] for i in range(6)})
    pos = spark.createDataFrame([(0, 1), (2, 3)], "anchor long, pos long")
    rows = hard_negatives(emb, pos, k=2).collect()
    assert {r.anchor for r in rows} == {0, 2}
    assert all(r.rank in (1, 2) for r in rows)
