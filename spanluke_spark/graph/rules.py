"""Horn-rule mining over the KG (AMIE-family, Galarraga et al. WWW'13,
restricted to closed 2-chains): discover rules

    p1(x, y) AND p2(y, z)  =>  p3(x, z)

with support and CWA confidence — the knowledge-base-completion signal
that tells a construction pipeline which missing edges it can densify
("decided_by(c, j) AND sits_in(j, r) => jurisdiction(c, r)") and which
extraction predicates are redundant paraphrases of each other.

Relational shape: one self-join of the (distinct) triple set on the
chain variable y, a distinct down to (p1, p2, x, z) instance pairs, one
join against the head predicate, two aggregates. Support and body size
count DISTINCT (x, z) groundings, as AMIE does.

The y-join fans out quadratically on hot chain nodes (every KG has a
few: countries, years). ``max_mid_degree`` caps that: drop y nodes whose
degree exceeds the cap before joining — the standard AMIE mitigation;
rules grounded ONLY through mega-hubs are uninformative anyway. Pass
None for the exact computation on graphs you know are hub-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_chain_rules(
    triples: DataFrame,
    min_support: int = 2,
    min_confidence: float = 0.0,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """triples(subj, pred, obj) -> (p1, p2, p3, support, body_pairs,
    confidence): every 2-chain rule with support >= min_support and
    confidence >= min_confidence. support = #distinct (x, z) where body
    and head both hold; body_pairs = #distinct (x, z) where the body
    holds; confidence = support / body_pairs (closed-world)."""
    t = triples.select("subj", "pred", "obj").distinct()

    mid = t
    if max_mid_degree is not None:
        deg = (
            t.select(F.col("obj").alias("node"))
            .unionByName(t.select(F.col("subj").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_mid_degree)
            .select("node")
        )
        t_in = t.join(
            deg.withColumnRenamed("node", "obj"), "obj", "left_semi"
        )
        t_out = t.join(
            deg.withColumnRenamed("node", "subj"), "subj", "left_semi"
        )
    else:
        t_in, t_out = t, t

    a = t_in.select(
        F.col("subj").alias("x"),
        F.col("pred").alias("p1"),
        F.col("obj").alias("y"),
    )
    b = t_out.select(
        F.col("subj").alias("y"),
        F.col("pred").alias("p2"),
        F.col("obj").alias("z"),
    )
    body = a.join(b, "y").select("p1", "p2", "x", "z").distinct()

    head = t.select(
        F.col("pred").alias("p3"),
        F.col("subj").alias("x"),
        F.col("obj").alias("z"),
    )
    grounded = body.join(head, ["x", "z"]).groupBy("p1", "p2", "p3").agg(
        F.count(F.lit(1)).alias("support")
    )
    body_sizes = body.groupBy("p1", "p2").agg(
        F.count(F.lit(1)).alias("body_pairs")
    )
    return (
        grounded.join(body_sizes, ["p1", "p2"])
        .withColumn(
            "confidence", F.col("support") / F.col("body_pairs")
        )
        .where(
            (F.col("support") >= min_support)
            & (F.col("confidence") >= min_confidence)
        )
    )


def mine_inverse_rules(
    triples: DataFrame,
    min_support: int = 1,
) -> DataFrame:
    """Inverse/symmetry rule mining — the other AMIE rule shape the
    2-chain miner cannot express:

        p(x, y)  =>  q(y, x)

    (q = p is the SYMMETRY special case: same_as, married_to). Detecting
    these tells the KG pipeline which predicate pairs are redundant
    paraphrases (cites / cited_by extracted from both link directions)
    so the canonicalizer can fold one into the other, and which
    predicates should be auto-densified with their inverses.

    -> (pred, inv_pred, support, n_body, confidence): support counts
    DISTINCT (x, y) with p(x, y) AND q(y, x); n_body = |distinct p
    groundings|; confidence = support / n_body (CWA, as AMIE). One
    self-join of the distinct triple set on the REVERSED key (content-
    driven (subj, obj) key — no predicate-level skew), two aggregates.
    """
    t = triples.select("subj", "pred", "obj").distinct()
    rev = t.select(
        F.col("obj").alias("subj"),
        F.col("pred").alias("inv_pred"),
        F.col("subj").alias("obj"),
    )
    matched = (
        t.join(rev, ["subj", "obj"])
        .groupBy("pred", "inv_pred")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    body = t.groupBy("pred").agg(F.count(F.lit(1)).alias("n_body"))
    return (
        matched.join(body, "pred")
        .where(F.col("support") >= min_support)
        .select(
            "pred",
            "inv_pred",
            "support",
            "n_body",
            F.round(F.col("support") / F.col("n_body"), 6).alias("confidence"),
        )
    )
