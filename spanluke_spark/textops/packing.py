"""Sequence packing: assign documents to fixed-token-budget training
sequences (the "pack short docs into one context window" step of an LLM
data pipeline).

Chunked packing: within a partition key, documents are taken in a
deterministic order and the running token total before each doc selects its
sequence id (floor(cum_before / budget)). This is the order-preserving
streaming-packer semantics — SQL-expressible on both engines, so fully
oracle-checkable.

Scale shape: the window runs per partition key. A bare low-cardinality key
(e.g. lang) would sort 10^12 rows through a handful of reducers, so
``with_shards`` adds a deterministic hash shard to the key first — packing
is a quota mechanism, not an ordering contract, so sharding it is free
parallelism. K shards * L langs windows, each ~|corpus|/(K*L).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64
from .quality import token_count


def with_shards(
    df: DataFrame, n_shards: int, id_col: str = "doc_id", out_col: str = "shard"
) -> DataFrame:
    """Deterministic hash shard in [0, n_shards) — portable (md5 twin)."""
    return df.withColumn(
        out_col,
        (portable_hash64(F.col(id_col).cast("string")) % n_shards).cast("int"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    part_cols: list[str] | None = None,
    order_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "seq_id",
) -> DataFrame:
    """Adds ``n_tokens`` and ``seq_id``: the fixed-budget sequence this doc
    lands in within its (part_cols, order_col) stream. Docs longer than the
    budget get a sequence of their own (the packer never splits a doc)."""
    part_cols = part_cols or []
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    nt = token_count(F.col(text_col))
    cum_before = F.coalesce(F.sum(nt).over(w), F.lit(0).cast("long"))
    return df.withColumn("n_tokens", nt).withColumn(
        out_col, F.floor(cum_before / budget).cast("long")
    )


def pack_stats(
    packed: DataFrame, part_cols: list[str], seq_col: str = "seq_id"
) -> DataFrame:
    """Per-sequence fill stats: docs per sequence, token total — the
    packing-efficiency report (map-side partial agg, one shuffle)."""
    return packed.groupBy(*part_cols, seq_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("sum_tokens"),
    )
