"""Deterministic Bloom-filter semi-join: prune a huge fact relation by a
key set that is too large to broadcast raw but fits as an m-slot filter —
the join-pruning primitive behind runtime row-group filtering (Spark's own
InjectRuntimeFilter inserts exactly this shape with bloom_filter_agg /
might_contain; Iceberg/Parquet bloom indexes are the storage-side twin).

This implementation uses textbook double hashing (Kirsch–Mitzenmacher
2006: position_i = (h1 + i*h2) mod m) over the repo's portable 60-bit md5
hash, so membership — INCLUDING which keys false-positive — is a pure
deterministic function of (key set, m, k) that a SQL oracle replays
bit-for-bit. Spark's native bloom_filter_agg is faster per probe but its
bit layout is opaque; swap it in behind the same signature when oracle
replay is not required.

Scale shape: the filter is the DISTINCT-position relation — at most m rows
of one long each, built by a partial-aggregated DISTINCT over the (small)
filter side. The probe side computes its k positions in codegen and runs k
broadcast LEFT SEMI joins against that one relation (Catalyst reuses the
broadcast exchange across the k joins, so the filter ships once). The
probe relation — the 100 TB side — never shuffles and never explodes:
row count is unchanged through every semi-join. A false positive rate of
~(1 - e^(-kn/m))^k falls out of m; the positions relation at 8 bytes/slot
costs 8x a true bitmap, the price of engine-side + oracle-replayable
probing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["bloom_positions", "build_bloom_relation", "bloom_semi_join"]


def bloom_positions(key: Column, m: int, k: int) -> list[Column]:
    """k double-hashed slot positions for a key (key is cast to string so
    Spark and the SQL twin hash identical bytes)."""
    s = key.cast("string")
    h1 = F.pmod(portable_hash64(s), F.lit(m))
    # step in [1, m-1]: never 0, so the k probes hit k (not necessarily
    # distinct) slots even when h2's raw hash is a multiple of m-1
    h2 = F.pmod(portable_hash64(F.concat(s, F.lit("#2"))), F.lit(m - 1)) + 1
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m)) for i in range(k)]


def build_bloom_relation(
    df: DataFrame, key_col: str, m: int = 1 << 20, k: int = 3
) -> DataFrame:
    """-> single-column relation ``pos`` (<= m rows): the set bits of the
    filter built from df[key_col]."""
    pos = F.explode(F.array(*bloom_positions(F.col(key_col), m, k)))
    return df.select(pos.alias("pos")).distinct()


def bloom_semi_join(
    probe: DataFrame,
    filter_df: DataFrame,
    probe_key: str,
    filter_key: str,
    m: int = 1 << 20,
    k: int = 3,
) -> DataFrame:
    """Rows of ``probe`` whose key the Bloom filter built from
    ``filter_df[filter_key]`` might contain (all true matches plus the
    deterministic false positives). Columns of ``probe`` pass through."""
    rel = build_bloom_relation(filter_df, filter_key, m, k)
    out = probe
    for i, p in enumerate(bloom_positions(F.col(probe_key), m, k)):
        out = out.withColumn(f"_bp{i}", p)
    for i in range(k):
        out = out.join(
            F.broadcast(rel), out[f"_bp{i}"] == rel["pos"], "left_semi"
        )
    return out.drop(*[f"_bp{i}" for i in range(k)])
