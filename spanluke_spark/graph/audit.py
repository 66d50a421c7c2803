"""KG quality audit: constraint violations and predicate profiles.

A trillion-page KG build emits noisy triples; before anything consumes
the graph, production KG stores (Wikidata's constraint reports, industrial
KG QA) audit it relationally. Two standard audits, both pure aggregates:

* ``functional_violations``: for predicates declared FUNCTIONAL (a
  subject may carry at most one value — e.g. one ``decided_on`` date per
  case), find subjects with >1 distinct object. The evidence array is
  BOUNDED (top ``sample_k`` objects by value + true ``n_values`` count)
  — never an unbounded ``collect_list`` (the r4 exact-dedup lesson,
  dedup/dedup.py).
* ``predicate_stats``: the per-predicate cardinality profile (triples,
  distinct subjects/objects, mean out-degree) analysts use to spot
  extraction drift between crawls. One pass, two-phase aggregates.

Both shuffle reduced keys only; the object strings leave the scan stage
solely inside the capped sample array.

Reference analogue: SpanLuke emits flat (subj, pred, obj) triples
(`graph/triples.py` materializes them); these are the graft's read-side
QA consumers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def functional_violations(
    triples: DataFrame, functional_preds: Sequence[str], sample_k: int = 3
) -> DataFrame:
    """(subj, pred, obj, ...) -> (subj, pred, n_values, sample_values)
    for subjects carrying >1 distinct object on a functional predicate.
    ``sample_values``: the ``sample_k`` smallest distinct objects
    (deterministic evidence, bounded row width)."""
    preds = [str(p) for p in functional_preds]
    return (
        triples.where(F.col("pred").isin(preds))
        .select("subj", "pred", "obj")
        .distinct()
        .groupBy("subj", "pred")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.slice(F.sort_array(F.collect_set("obj")), 1, sample_k).alias(
                "sample_values"
            ),
        )
        .where(F.col("n_values") > 1)
    )


def predicate_stats(triples: DataFrame) -> DataFrame:
    """(subj, pred, obj, ...) -> per-predicate profile:
    (pred, n_triples, n_subjects, n_objects, avg_objs_per_subject).
    ``avg_objs_per_subject`` = distinct (subj, obj) pairs / distinct
    subjects — the functional-ness score (1.0 == perfectly functional)."""
    return (
        triples.groupBy("pred")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.countDistinct("subj").alias("n_subjects"),
            F.countDistinct("obj").alias("n_objects"),
            (
                F.countDistinct("subj", "obj").cast("double")
                / F.countDistinct("subj")
            ).alias("avg_objs_per_subject"),
        )
    )


def sameas_hairballs(
    same_as: DataFrame,
    types: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    type_col: str = "type",
) -> DataFrame:
    """The sameAs-hairball audit (the classic linked-data pathology —
    Halpin et al. 2010, "When owl:sameAs isn't the same"): transitive
    sameAs closure silently merges DISTINCT real-world entities when one
    bad link lands in a chain, and the tell is a connected component
    whose members carry more than one entity TYPE (a court chained to a
    statute is a wrong merge, however plausible each individual edge).

    -> (component, n_entities, n_types, types) for every sameAs
    component whose members span >= 2 distinct types; ``types`` is the
    sorted distinct type array (bounded by the type vocabulary, never by
    component size — no unbounded collect of members).

    Components come from canon/cc.py (alternating-star, skew-salted);
    the type join is one hash join on the node id; the per-component
    aggregate is map-side combinable.
    """
    from ..canon.cc import connected_components

    comp = connected_components(same_as, src=src, dst=dst)
    typed = comp.join(
        types.select(F.col(node_col).alias("node"), F.col(type_col).alias("t")),
        "node",
    )
    return (
        typed.groupBy(F.col("component"))
        .agg(
            F.count(F.lit(1)).alias("n_entities"),
            F.countDistinct("t").alias("n_types"),
            F.sort_array(F.collect_set("t")).alias("types"),
        )
        .where(F.col("n_types") >= 2)
    )
