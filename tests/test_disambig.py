"""Entity disambiguation: hand-checked scoring, NIL mentions, tie-breaks,
and the broadcast-dictionary plan shape."""

from __future__ import annotations

import pytest

from spanluke_spark.link.disambig import disambiguate


def _fixture(spark):
    mentions = spark.createDataFrame(
        [(1, "apple"), (2, "apple"), (3, "unknown")],
        "mention_id long, anchor string",
    )
    stats = spark.createDataFrame(
        [("apple", 10, 9), ("apple", 20, 1)], "anchor string, entity long, cnt long"
    )
    mention_terms = spark.createDataFrame(
        [(1, "fruit"), (1, "pie"), (2, "iphone"), (2, "mac")],
        "mention_id long, term string",
    )
    entity_terms = spark.createDataFrame(
        [(10, "iphone"), (10, "mac"), (20, "fruit"), (20, "pie")],
        "entity long, term string",
    )
    return mentions, stats, mention_terms, entity_terms


def test_context_beats_prior_and_vice_versa(spark):
    out = disambiguate(*_fixture(spark)).collect()
    got = {r.mention_id: r for r in out}
    # mention 1's context matches entity 20 fully (jac 1.0): 0.1*1.0 > 0.9*0
    assert got[1].entity == 20
    assert got[1].score == pytest.approx(0.1)
    # mention 2's context matches entity 10: 0.9*1.0 wins
    assert got[2].entity == 10 and got[2].score == pytest.approx(0.9)
    # unknown anchor -> NIL -> no row
    assert 3 not in got


def test_zero_overlap_falls_back_to_commonness(spark):
    mentions, stats, _, entity_terms = _fixture(spark)
    blank_terms = mentions.limit(0).selectExpr(
        "mention_id", "anchor as term"
    )
    # give both mentions a context that matches nothing
    mt = mentions.selectExpr("mention_id", "'zzz' as term").where("mention_id <= 2")
    out = {r.mention_id: r for r in
           disambiguate(mentions, stats, mt, entity_terms).collect()}
    # all scores 0 -> commonness desc breaks the tie -> entity 10
    assert out[1].entity == 10 and out[1].score == 0.0
    assert blank_terms.count() == 0  # (shape helper exercised)


def test_dictionary_is_broadcast(spark):
    mentions, stats, mt, et = _fixture(spark)
    plan = (
        disambiguate(mentions, stats, mt, et)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
