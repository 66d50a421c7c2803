"""Consistent-hash ring assignment (Karger et al. 1997) with virtual
nodes — the classic fetcher/shard router beside rendezvous/HRW
hashing (q276): keys map to the first virtual point clockwise on the
hash circle, so adding or removing a node only moves the keys in the
arcs it owns (~1/n of the space with v virtual points smoothing the
variance), never a key between two surviving nodes.

Zero-shuffle shape, like the HRW lane: the ring is nodes x v rows ->
ONE sorted array of (point_hash, node, v) structs, broadcast onto the
key table; per key the successor point is an ``F.filter`` +
``element_at`` over that array (wrap to the array head). No join, no
window — the ring is configuration-sized, the key axis is
embarrassingly parallel.

Hashes are the repo's portable md5-60bit (identical literal expression
in the DuckDB oracle): point = h(node || ':' || v), key = h(key).
Struct comparison sorts by (ph, node, v), pinning collisions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["ring_assign"]


def _h60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def ring_assign(
    keys: DataFrame,
    nodes: list[str],
    vnodes: int = 32,
    key_col: str = "key",
) -> DataFrame:
    """(key) x nodes -> (key, kh, node, point_ph): each key routed to
    the first virtual point at/after its hash, wrapping to the ring
    head."""
    spark = keys.sparkSession
    ring = (
        spark.createDataFrame([(n,) for n in nodes], "node string")
        .select(
            "node",
            F.explode(F.sequence(F.lit(0), F.lit(vnodes - 1))).alias("v"),
        )
        .select(
            F.struct(
                _h60(
                    F.concat(F.col("node"), F.lit(":"), F.col("v"))
                ).alias("ph"),
                "node",
                "v",
            ).alias("pt")
        )
        .groupBy()
        .agg(F.array_sort(F.collect_list("pt")).alias("ring"))
    )
    k = keys.select(F.col(key_col).alias("key"), _h60(F.col(key_col)).alias("kh"))
    x = k.crossJoin(F.broadcast(ring))
    succ = F.filter(F.col("ring"), lambda p: p["ph"] >= F.col("kh"))
    chosen = F.when(F.size(succ) > 0, F.element_at(succ, 1)).otherwise(
        F.element_at(F.col("ring"), 1)
    )
    return x.select(
        "key",
        "kh",
        chosen["node"].alias("node"),
        chosen["ph"].alias("point_ph"),
    )
