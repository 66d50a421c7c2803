"""Rendezvous (highest-random-weight) hashing — minimal-disruption key
placement (Thaler & Ravishankar 1996): key k lands on
argmax_n hash(k, n) over the node set. When a node leaves, ONLY its own
keys move (every other key's argmax is untouched — the property
consistent-hashing rings approximate and HRW gives exactly); when a
node joins, only the keys it now wins move. This is the placement rule
for crawl-frontier sharding, per-host politeness queues, and cache
affinity.

Spark-first shape: the node set is cluster membership — a tiny literal
list — so the argmax is computed INSIDE a single projection
(``array_max`` over (weight, node) structs built by ``transform`` from
an array literal): zero shuffles, zero joins, whole-stage codegen. The
migration matrix between two node sets is then ONE aggregation over
that projection. Weights use the md5-derived portable hash
(dedup/dedup.py:33) so the DuckDB oracle replays every assignment
bit-for-bit; ties (cryptographically negligible, but defined) break to
the lexicographically larger node.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["rendezvous_node", "rendezvous_assign", "placement_report"]


def rendezvous_node(key: Column, nodes: Sequence[str]) -> Column:
    """Column expression: the HRW winner for ``key`` among ``nodes``.
    Pure projection — no shuffle, no join."""
    if not nodes:
        raise ValueError("rendezvous over an empty node set")
    arr = F.array(*[F.lit(n) for n in sorted(nodes)])
    scored = F.transform(
        arr,
        lambda n: F.struct(
            portable_hash64(F.concat(key, F.lit("@"), n)).alias("w"),
            n.alias("n"),
        ),
    )
    return F.array_max(scored)["n"]


def rendezvous_assign(
    keys: DataFrame, nodes: Sequence[str], key_col: str = "key"
) -> DataFrame:
    """Append ``node`` = HRW placement of ``key_col`` over ``nodes``."""
    return keys.withColumn("node", rendezvous_node(F.col(key_col), nodes))


def placement_report(
    keys: DataFrame,
    nodes_before: Sequence[str],
    nodes_after: Sequence[str],
    key_col: str = "key",
) -> DataFrame:
    """Migration matrix between two node sets: one row per
    (node_before, node_after) with the distinct-key count that takes
    that transition. Both assignments are columns of the SAME
    projection, so the whole report is one distinct + one aggregate.
    HRW's minimal-disruption guarantee shows up as structure: on a pure
    node removal every off-diagonal row has node_before = the removed
    node."""
    k = F.col(key_col)
    placed = keys.select(
        k.alias("key"),
        rendezvous_node(k, nodes_before).alias("node_before"),
        rendezvous_node(k, nodes_after).alias("node_after"),
    ).distinct()
    return placed.groupBy("node_before", "node_after").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("node_before") != F.col("node_after"), 1).otherwise(0))
        .alias("n_moved"),
    )
