"""Truth discovery over conflicting triple claims — resolve which obj a
web-scale KG should believe for each (subj, pred) when millions of
source pages disagree, by jointly estimating source reliability and
claim confidence (Yin et al. TruthFinder / Pasternack-Roth "Knowing What
to Believe" voting family, in its deterministic fixed-round form).

Each round is purely relational — no windows over unbounded partitions,
no driver loops over data:

  vote(s,p,o)   = SUM over asserting sources of trust(source)     (1 agg)
  belief(s,p,o) = vote / SUM of vote over the same (subj,pred)    (agg+join
                  on the REDUCED value table, never the claim table)
  trust(source) = AVG of belief over the source's claims          (1 join
                  claims->beliefs on (s,p,o), 1 agg by source)

so a round costs three hash aggregations and two equi-joins, each keyed
well below the raw claim cardinality; the 10^12-row claim table is
touched once per round via a co-partitioned join, never windowed.
Lineage is truncated per round with localCheckpoint (same discipline as
graph/pagerank.py and link/kmeans.py). Deterministic: uniform initial
trust, fixed round count, no RNG.

Reference analogue: lambdavi/SpanLuke emits one model's spans per
document (`legal_ner/inference.py`); at crawl scale the SAME fact is
re-extracted from many pages with contradictions, and this operator is
the aggregation layer the reference never needed single-node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_CLAIM_KEY = ["subj", "pred", "obj"]
_FACT_KEY = ["subj", "pred"]


def _beliefs(claims: DataFrame, trust: DataFrame) -> DataFrame:
    """claims(source,s,p,o) x trust(source,trust) -> belief per distinct
    (subj,pred,obj), normalized within each (subj,pred)."""
    votes = (
        claims.join(trust, "source")
        .groupBy(*_CLAIM_KEY)
        .agg(F.sum("trust").alias("vote"))
    )
    totals = votes.groupBy(*_FACT_KEY).agg(F.sum("vote").alias("total"))
    return votes.join(totals, _FACT_KEY).select(
        *_CLAIM_KEY, (F.col("vote") / F.col("total")).alias("belief")
    )


def truth_discovery(
    claims: DataFrame,
    rounds: int = 2,
    initial_trust: float = 0.8,
) -> tuple[DataFrame, DataFrame]:
    """claims(source, subj, pred, obj) -> (facts, trust).

    facts: one row per (subj, pred) — the belief-argmax obj (ties broken
    by max obj so the result is a pure function of the input set), its
    final belief, and n_sources that asserted the winner.
    trust: final per-source reliability in [0, 1].

    Duplicate assertions of the same claim by the same source count
    once (one page, one vote).
    """
    c = claims.select("source", *_CLAIM_KEY).distinct().localCheckpoint(
        eager=True
    )
    trust = (
        c.select("source")
        .distinct()
        .withColumn("trust", F.lit(float(initial_trust)))
    )
    beliefs = None
    for _ in range(rounds):
        beliefs = _beliefs(c, trust).localCheckpoint(eager=True)
        trust = c.join(beliefs, _CLAIM_KEY).groupBy("source").agg(
            F.avg("belief").alias("trust")
        )
    trust = trust.localCheckpoint(eager=True)

    support = c.groupBy(*_CLAIM_KEY).agg(
        F.count(F.lit(1)).alias("n_sources")
    )
    facts = (
        beliefs.join(support, _CLAIM_KEY)
        .groupBy(*_FACT_KEY)
        .agg(
            F.max(
                F.struct(
                    F.col("belief"), F.col("obj"), F.col("n_sources")
                )
            ).alias("_w")
        )
        .select(
            *_FACT_KEY,
            F.col("_w.obj").alias("obj"),
            F.col("_w.belief").alias("belief"),
            F.col("_w.n_sources").alias("n_sources"),
        )
    )
    return facts, trust
