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


def content_defined_chunks(
    df: DataFrame,
    window: int = 16,
    mask_bits: int = 6,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Content-defined chunking (the CDC idea behind LBFS/restic/borg
    dedup storage, Muthitacharoen et al. 2001): cut each document where a
    hash of the trailing ``window`` characters satisfies
    ``h % 2^mask_bits == 0``, so chunk boundaries move WITH the content —
    an insertion near the front shifts byte offsets but downstream chunks
    re-align and re-deduplicate (the property fixed-size chunking lacks).

    -> (doc_id, chunk_idx, start, length, chunk_hash): 0-based character
    offsets; chunk_hash = md5 of the chunk text for content-addressed
    grouping. Expected chunk length = 2^mask_bits characters.

    Relational form: boundary positions via one transform over the
    position sequence (md5 per sliding window — O(n·w) work per doc but
    fully codegen and shuffle-free; a true O(n) rolling polynomial needs
    a sequential scan that does not parallelize per-row), then
    islands-to-chunks with array ops — still zero shuffles. No min/max
    chunk-size clamps: those require a greedy sequential pass (documented
    cut; the mask already controls the expected size).
    """
    from ..dedup.dedup import portable_hash64

    n = F.length(F.col(text_col))
    mask = (1 << mask_bits) - 1
    # candidate cut AFTER position i (1-based) when the window ending at i
    # hashes to 0 under the mask; windows need i >= window
    positions = F.sequence(F.lit(window), n)
    is_cut = F.transform(
        positions,
        lambda i: (
            portable_hash64(F.substring(F.col(text_col), i - window + 1, window))
            .bitwiseAND(F.lit(mask))
            == 0
        ),
    )
    cuts = F.zip_with(
        positions, is_cut, lambda p, c: F.when(c, p)
    )
    starts = F.concat(
        F.array(F.lit(0)), F.filter(cuts, lambda x: x.isNotNull())
    )
    # drop a final cut equal to n (it would mint an empty chunk)
    starts = F.filter(
        starts, lambda s, i: (i == 0) | (s < n)
    )
    ends = F.concat(F.slice(starts, 2, 2147483646), F.array(n))

    chunks = F.zip_with(
        starts, ends, lambda s, e: F.struct(s.alias("start"), (e - s).alias("length"))
    )
    out = df.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_txt"),
        F.posexplode(chunks).alias("chunk_idx", "c"),
    )
    return out.select(
        "doc_id",
        "chunk_idx",
        F.col("c.start").alias("start"),
        F.col("c.length").alias("length"),
        F.md5(
            F.substring(F.col("_txt"), F.col("c.start") + 1, F.col("c.length"))
        ).alias("chunk_hash"),
    )
