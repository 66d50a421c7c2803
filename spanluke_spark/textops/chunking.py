"""Sliding-window document chunking — the "split long docs into overlapping
context windows" step of LLM training-data and RAG pipelines.

Pure per-row array expressions (split / sequence / explode / slice): at
10^12 docs this is a scan-project with no shuffle; the row multiplication
happens after column pruning, so only (id, window) tuples flow on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, chunk_id, chunk_start, n_chunk_tokens, chunk_text).

    Chunk i covers tokens [i*stride, i*stride + chunk_tokens) with
    stride = chunk_tokens - overlap; the final window is the (possibly
    partial) one that reaches the last token. A doc shorter than one chunk
    yields exactly one chunk. Deterministic, order-preserving.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # integer ceil((n - chunk)/stride) + 1, clamped to >= 1
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - F.lit(chunk_tokens) + F.lit(stride) - 1) / F.lit(stride)) + 1
    )
    exploded = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    piece = F.slice(F.col("_toks"), start + 1, chunk_tokens)
    return exploded.select(
        id_col,
        "chunk_id",
        start.cast("long").alias("chunk_start"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )
