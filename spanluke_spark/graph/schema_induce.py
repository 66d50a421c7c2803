"""Schema induction over an instance-level KG: profile every
(subject_type, predicate, object_type) combination actually used by the
data — the first step of ontology engineering over a crawled graph, and
the statistics a query planner / constraint auditor needs (which
predicates connect which classes, how selectively).

One join of the triple stream against the type table per side, then a
single hash aggregate; entities with multiple types fan out to every
type pair (the standard "characteristic set" expansion). Untyped
entities profile under the sentinel type so dirty-graph mass stays
visible instead of silently vanishing — at crawl scale MOST entities
are untyped and dropping them would hide the dominant schema row.

The type table is usually much smaller than the triple stream but NOT
broadcastable at 10^9 typed entities, so both joins are plain equi-joins
on the entity key (co-partitioned by AQE); nothing here windows or
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

UNTYPED = "_untyped"


def induce_schema(
    triples: DataFrame,
    types: DataFrame,
) -> DataFrame:
    """triples(subj, pred, obj) x types(entity, type) ->
    (subj_type, pred, obj_type, n_facts, n_subj, n_obj): one profile row
    per realized type pair, with distinct participating entity counts.
    """
    st = types.select(
        F.col("entity").alias("subj"), F.col("type").alias("subj_type")
    )
    ot = types.select(
        F.col("entity").alias("obj"), F.col("type").alias("obj_type")
    )
    typed = (
        triples.select("subj", "pred", "obj")
        .join(st, "subj", "left")
        .join(ot, "obj", "left")
        .select(
            F.coalesce("subj_type", F.lit(UNTYPED)).alias("subj_type"),
            "pred",
            F.coalesce("obj_type", F.lit(UNTYPED)).alias("obj_type"),
            "subj",
            "obj",
        )
    )
    return typed.groupBy("subj_type", "pred", "obj_type").agg(
        F.count(F.lit(1)).alias("n_facts"),
        F.countDistinct("subj").alias("n_subj"),
        F.countDistinct("obj").alias("n_obj"),
    )


def learn_type_constraints(
    triples: DataFrame,
    types: DataFrame,
) -> DataFrame:
    """Learn per-predicate domain/range constraints FROM the data (the
    inverse of entailment.rdfs_entail, and the input graph/audit.py
    wants): for each predicate, the dominant subject and object type
    among typed participants, with support and confidence ->
    (pred, domain_type, domain_support, domain_conf, range_type,
    range_support, range_conf). A predicate whose domain_conf is 0.99
    earns a constraint; one at 0.4 is polysemous or dirty.

    Two triple-side joins + per-(pred, type) aggregates + a max_by
    argmax per pred (ties broken by type string) — no windows, no
    collects. Untyped participants are excluded from the vote (they
    carry no evidence), unlike induce_schema which keeps them visible.
    """

    def _side(col: str) -> DataFrame:
        t = types.select(
            F.col("entity").alias(col), F.col("type").alias("t")
        )
        counts = (
            triples.join(t, col)
            .groupBy("pred", "t")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        return counts.groupBy("pred").agg(
            F.max(F.struct("n", "t")).alias("_w"),
            F.sum("n").alias("_total"),
        )

    dom = _side("subj").select(
        "pred",
        F.col("_w.t").alias("domain_type"),
        F.col("_w.n").alias("domain_support"),
        (F.col("_w.n") / F.col("_total")).alias("domain_conf"),
    )
    rng = _side("obj").select(
        "pred",
        F.col("_w.t").alias("range_type"),
        F.col("_w.n").alias("range_support"),
        (F.col("_w.n") / F.col("_total")).alias("range_conf"),
    )
    return dom.join(rng, "pred", "full_outer")
