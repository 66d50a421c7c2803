"""Gale-Shapley stable matching, distributed synchronous rounds — the
one-to-one assignment family's OPTIMALITY member: graph/matching.py's
locally-dominant greedy gives a 1/2-approx maximum-WEIGHT matching;
Gale-Shapley gives the proposer-optimal STABLE matching (no pair would
rather defect to each other), the textbook rule for assigning crawl
tasks to annotators, queries to review pools, or ads to slots when
both sides hold preference lists.

Parallel-round variant (each round EVERY free proposer proposes to its
next choice; each acceptor keeps the best of {incoming proposals,
current partner}; losers re-enter the pool): produces exactly the same
proposer-optimal matching as the sequential 1962 algorithm — the
deferred-acceptance outcome is independent of proposal order — which
the pytest checks against a sequential python replay.

State is one row per proposer (p, ptr, a): ptr = next preference index
(advances whenever p PROPOSES, win or lose — a later dump resumes from
the next choice, never re-proposes), a = tentative acceptor or NULL.
Each round is three small joins + one per-acceptor argmin (acceptor
ranks are distinct, so winners are unique — no tie ambiguity
anywhere); rounds localCheckpoint so the plan never accretes.
Proposers absent from an acceptor's list are unacceptable: their
proposal drops in the rank join (rejected), matching the standard
incomplete-list semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["gale_shapley"]


def gale_shapley(
    prefs_p: DataFrame,
    prefs_a: DataFrame,
    max_rounds: int = 200,
) -> DataFrame:
    """prefs_p (p, rank, a) / prefs_a (a, rank, p), ranks dense from 1
    within each side's partition -> the proposer-optimal stable
    matching (p, a, p_rank, a_rank), unmatched proposers omitted."""
    pp = prefs_p.select("p", "rank", "a").localCheckpoint(eager=True)
    pa = prefs_a.select("a", "rank", "p").localCheckpoint(eager=True)
    state = (
        pp.select("p")
        .distinct()
        .select(
            "p",
            F.lit(1).alias("ptr"),
            F.lit(None).cast(pa.schema["a"].dataType).alias("a"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        proposals = (
            state.where(F.col("a").isNull())
            .select("p", F.col("ptr").alias("rank"))
            .join(pp, ["p", "rank"])
            .select("p", F.col("a").alias("ta"))
            .localCheckpoint(eager=True)
        )
        if proposals.limit(1).count() == 0:
            break
        cand = proposals.select(F.col("ta").alias("a"), "p").unionByName(
            state.where(F.col("a").isNotNull()).select("a", "p")
        )
        ranked = cand.join(pa, ["a", "p"])  # unacceptable proposals drop
        w = Window.partitionBy("a").orderBy("rank")
        winners = (
            ranked.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("a", "p")
        )
        proposed = proposals.select("p").distinct().withColumn(
            "_did", F.lit(1)
        )
        state = (
            state.select("p", "ptr")
            .join(proposed, "p", "left")
            .join(winners.select(F.col("p"), F.col("a")), "p", "left")
            .select(
                "p",
                F.when(F.col("_did").isNotNull(), F.col("ptr") + 1)
                .otherwise(F.col("ptr"))
                .alias("ptr"),
                "a",
            )
            .localCheckpoint(eager=True)
        )
    matched = state.where(F.col("a").isNotNull()).select("p", "a")
    return (
        matched.join(pp.withColumnRenamed("rank", "p_rank"), ["p", "a"])
        .join(pa.withColumnRenamed("rank", "a_rank"), ["a", "p"])
        .select("p", "a", "p_rank", "a_rank")
    )
