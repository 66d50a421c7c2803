"""RDFS entailment materialization — expand an instance-level triple
table with the facts an RDFS ontology implies, the standard "forward
chaining" step a KG store runs at load time (rules rdfs2/3/5/7/9/11 of
the W3C RDF Semantics entailment table).

The ontology (subclass_of / subproperty_of / domain / range statements)
is tiny next to the 10^12-row instance table, so the strategy is:

  1. transitively close the subclass and subproperty hierarchies with
     graph/closure.py path doubling (rdfs5 + rdfs11) — ontology-sized
     work only;
  2. BROADCAST the closed (reflexive) hierarchies onto the instance
     triples: one broadcast join fans each triple out to its entailed
     super-properties (rdfs7), one derives type assertions from
     domain/range declarations (rdfs2/rdfs3), one lifts every type
     assertion through the subclass closure (rdfs9).

The instance table is never shuffled except by the closing distinct()
that dedupes facts derivable along multiple paths. That stratification
(subproperty -> domain/range -> subclass) IS the fixpoint for this rule
subset because derived type triples feed only rdfs9, which is closed by
construction; the self-referential corner (domain/range declared on the
type predicate itself) is out of scope, as in every production RDFS
reasoner's "D-entailment off" mode.

Reference analogue: the reference's label set (COURT < AUTHORITY etc.)
is flat; a web-scale legal KG needs typed-hierarchy queries ("all
AUTHORITY mentions") answered from materialized entailment, not
per-query closure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .closure import transitive_closure


def _reflexive_closure(
    edges: DataFrame, universe: DataFrame, node: str
) -> DataFrame:
    """Transitive closure of edges(src,dst) plus (x, x) for every x in
    universe(node) — so broadcast-joining the closure keeps the
    underived fact alongside its entailments."""
    closed = transitive_closure(edges)
    ident = universe.select(
        F.col(node).alias("src"), F.col(node).alias("dst")
    )
    return closed.unionByName(ident).distinct()


def rdfs_entail(
    triples: DataFrame,
    ontology: DataFrame,
    type_pred: str = "a",
) -> DataFrame:
    """triples(subj, pred, obj) + ontology(subj, pred, obj) with
    ontology preds in {subclass_of, subproperty_of, domain, range} ->
    the distinct entailed instance triples (originals included; type
    assertions use ``type_pred``).
    """
    sub_c = ontology.where(F.col("pred") == "subclass_of").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    sub_p = ontology.where(F.col("pred") == "subproperty_of").select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    dom = ontology.where(F.col("pred") == "domain").select(
        F.col("subj").alias("p"), F.col("obj").alias("cls")
    )
    rng = ontology.where(F.col("pred") == "range").select(
        F.col("subj").alias("p"), F.col("obj").alias("cls")
    )

    preds = triples.select(F.col("pred").alias("n")).distinct().unionByName(
        sub_p.select(F.col("src").alias("n"))
    )
    p_closed = _reflexive_closure(sub_p, preds, "n")

    # rdfs7 (+ identity): every triple restated under each super-property
    lifted = (
        triples.join(
            F.broadcast(p_closed), triples.pred == p_closed.src
        )
        .select("subj", F.col("dst").alias("pred"), "obj")
    )

    # rdfs2 / rdfs3 over the property-lifted triples
    non_type = lifted.where(F.col("pred") != type_pred)
    t_dom = non_type.join(
        F.broadcast(dom), non_type.pred == dom.p
    ).select("subj", F.col("cls").alias("c"))
    t_rng = non_type.join(
        F.broadcast(rng), non_type.pred == rng.p
    ).select(F.col("obj").alias("subj"), F.col("cls").alias("c"))
    t_explicit = lifted.where(F.col("pred") == type_pred).select(
        "subj", F.col("obj").alias("c")
    )
    types = t_explicit.unionByName(t_dom).unionByName(t_rng)

    # rdfs9 (+ identity): lift type assertions through the class closure
    classes = types.select(F.col("c").alias("n")).distinct().unionByName(
        sub_c.select(F.col("src").alias("n"))
    )
    c_closed = _reflexive_closure(sub_c, classes, "n")
    all_types = (
        types.join(F.broadcast(c_closed), types.c == c_closed.src)
        .select("subj", F.lit(type_pred).alias("pred"), F.col("dst").alias("obj"))
    )

    return lifted.unionByName(all_types).distinct()
