"""TransE filtered-rank evaluation: hand-computed ranks on tiny integer
vectors, the filtering rule, the tie-break, and metrics parity."""

from __future__ import annotations

import pytest

from spanluke_spark.graph.kge_eval import ranking_metrics, transe_filtered_ranks


@pytest.fixture(scope="module")
def tiny(spark):
    # 1-D embeddings make distances easy: e0=0, e1=1, e2=2, e3=5 (x1000
    # fixed-point is exact on these)
    entities = spark.createDataFrame(
        [(0, [0.0]), (1, [1.0]), (2, [2.0]), (3, [5.0])],
        "entity_id long, vec array<float>",
    )
    relations = spark.createDataFrame([("r", [1.0])], "rel string, vec array<float>")
    return entities, relations


def test_hand_computed_rank(spark, tiny):
    entities, relations = tiny
    # test triple (0, r, 2): e_s + e_r = 1 -> distances: c0:1000, c1:0,
    # c2:1000, c3:4000. True tail c2 distance 1000.
    test = spark.createDataFrame([(0, "r", 2)], "s long, rel string, o long")
    ranks = transe_filtered_ranks(entities, relations, test, truth=test).collect()
    # better: c1 (0 < 1000) and c0 (tie 1000, id 0 < 2) -> rank 3
    assert ranks == [pytest.approx((0, "r", 2, 3))] or (
        ranks[0].s,
        ranks[0].rel,
        ranks[0].o,
        ranks[0].rank,
    ) == (0, "r", 2, 3)


def test_filter_removes_known_true_candidates(spark, tiny):
    entities, relations = tiny
    test = spark.createDataFrame([(0, "r", 2)], "s long, rel string, o long")
    # declaring (0, r, 1) true removes the strictly-better candidate c1
    truth = spark.createDataFrame(
        [(0, "r", 2), (0, "r", 1)], "s long, rel string, o long"
    )
    r = transe_filtered_ranks(entities, relations, test, truth).collect()[0]
    assert r.rank == 2  # only the c0 tie remains ahead


def test_true_tail_never_counts_against_itself(spark, tiny):
    entities, relations = tiny
    # (0, r, 1): true tail IS the unique best candidate -> rank 1
    test = spark.createDataFrame([(0, "r", 1)], "s long, rel string, o long")
    r = transe_filtered_ranks(entities, relations, test, truth=test).collect()[0]
    assert r.rank == 1


def test_ranking_metrics(spark):
    ranks = spark.createDataFrame(
        [(0, "r", 1, 1), (1, "r", 2, 4), (2, "q", 3, 12)],
        "s long, rel string, o long, rank long",
    )
    by_rel = {r.rel: r for r in ranking_metrics(ranks).collect()}
    assert by_rel["r"].n_test == 2
    assert by_rel["r"].mrr == pytest.approx((1 + 0.25) / 2, abs=1e-6)
    assert by_rel["r"].hits1 == 0.5 and by_rel["r"].hits3 == 0.5
    assert by_rel["q"].hits10 == 0.0
    overall = ranking_metrics(ranks, by_rel=False).collect()[0]
    assert overall.n_test == 3
    assert overall.mrr == pytest.approx((1 + 0.25 + 1 / 12) / 3, abs=1e-6)
