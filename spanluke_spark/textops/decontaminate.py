"""Benchmark decontamination: remove training documents that overlap an
evaluation set — the standard pretraining-hygiene operator (GPT-3 appendix
C popularized 13-gram overlap; Llama/FineWeb-class pipelines do the same).

Scale shape: the benchmark side is tiny (thousands of eval documents ->
at most a few million distinct n-grams) and BROADCASTS; the corpus side
explodes to word n-grams and probes the broadcast set with a hash
left-semi join, then one aggregate keyed by doc id — so the 10^12-row side
is never shuffled for the probe, and map-side partial aggregation keeps the
one exchange at ~|docs| rows. Everything is the engine's deterministic
hashing (``word_shingles`` + xxhash64), so the operator is exactly
replayable in the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import word_shingles

DEFAULT_N = 13  # GPT-3 appendix C's 13-gram rule

# Unicode punctuation (P*) and symbols (S*) — the "lowercase + strip
# punctuation" normalization GPT-3 appendix C applies before n-gram overlap,
# as a property class every engine in play agrees on: Java regex (Spark),
# RE2 (DuckDB) and unicodedata categories (the Python oracle).
_PUNCT_CLASS = r"[\p{P}\p{S}]"


def normalize_for_overlap(text: Column) -> Column:
    """Lowercase + punctuation/symbol -> space. Applied identically to both
    sides so trivially reformatted benchmark text ("The fox, quick!" vs
    "the fox quick") still collides; ``word_shingles`` splits on \\s+ so the
    introduced spaces never create empty tokens."""
    return F.regexp_replace(F.lower(text), _PUNCT_CLASS, " ")


def _gram_source(text: Column, normalize: bool) -> Column:
    return normalize_for_overlap(text) if normalize else text


def benchmark_ngrams(
    bench: DataFrame, n: int = DEFAULT_N, text_col: str = "text", normalize: bool = True
) -> DataFrame:
    """Distinct hashed word n-grams of the evaluation texts -> (h: long).
    The broadcastable contamination fingerprint of the benchmark."""
    return (
        bench.select(
            F.explode(word_shingles(_gram_source(F.col(text_col), normalize), n)).alias("_g")
        )
        .select(F.xxhash64("_g").alias("h"))
        .distinct()
    )


MAX_BROADCAST_GRAMS = 5_000_000  # ~40 MB of longs — safely inside default
# broadcast limits; a mega eval suite (10^7+ distinct 13-grams) must NOT be
# force-broadcast into every executor


def flag_contaminated(
    docs: DataFrame,
    bench_grams: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = True,
    max_broadcast_grams: int | None = MAX_BROADCAST_GRAMS,
) -> DataFrame:
    """docs + (n_hits: matching benchmark n-grams, contaminated: bool).

    ``normalize`` must match the flag ``benchmark_ngrams`` was built with —
    both sides of the overlap see the same token stream.

    The benchmark fingerprint is probed with ``limit(K+1).count()`` (bounded
    job, never a full count) and broadcast only when it fits under
    ``max_broadcast_grams``; an over-sized eval suite falls back to a
    shuffled left_semi join instead of blowing the broadcast limit.
    ``max_broadcast_grams=None`` skips the probe and always broadcasts
    (keeps the operator fully lazy — the composition-pipeline mode).

    A doc shorter than ``n`` words has no n-grams and can never be flagged
    (matching the reference rule: overlap is defined on full n-grams)."""
    probe = bench_grams
    if max_broadcast_grams is not None:
        fits = bench_grams.limit(max_broadcast_grams + 1).count() <= max_broadcast_grams
        probe = F.broadcast(bench_grams) if fits else bench_grams
    else:
        probe = F.broadcast(bench_grams)
    hits = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(word_shingles(_gram_source(F.col(text_col), normalize), n)).alias("_g"),
        )
        .select("_id", F.xxhash64("_g").alias("h"))
        .join(probe, "h", "left_semi")
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.join(hits.withColumnRenamed("_id", id_col), id_col, "left")
        .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_hits") > 0)
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_hits: int = 1,
    normalize: bool = True,
    max_broadcast_grams: int | None = MAX_BROADCAST_GRAMS,
) -> DataFrame:
    """Training docs minus those sharing >= ``min_hits`` word n-grams with
    the benchmark — document-level removal (the Llama/FineWeb policy; the
    windowed-span excision variant composes from ``flag_contaminated`` +
    ``chunking`` if partial salvage is ever preferred). The size guard
    costs one bounded probe job over the (tiny) benchmark side; pass
    ``max_broadcast_grams=None`` for a fully lazy composition."""
    flagged = flag_contaminated(
        docs,
        benchmark_ngrams(bench, n, text_col, normalize),
        n,
        id_col,
        text_col,
        normalize,
        max_broadcast_grams,
    )
    return flagged.filter(F.col("n_hits") < min_hits).drop("n_hits", "contaminated")


def py_normalize_for_overlap(t: str) -> str:
    """Python twin of ``normalize_for_overlap`` (unicodedata P*/S*)."""
    import unicodedata

    return "".join(
        " " if unicodedata.category(c)[0] in "PS" else c for c in t.lower()
    )


def py_ngram_overlap(
    doc_text: str, bench_texts: list[str], n: int = DEFAULT_N, normalize: bool = True
) -> int:
    """Pure-Python oracle: # of doc word-n-grams present in the benchmark."""
    def grams(t: str) -> set[tuple[str, ...]]:
        if normalize:
            t = py_normalize_for_overlap(t)
        ws = t.split()
        return {tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    bench_set: set[tuple[str, ...]] = set()
    for t in bench_texts:
        bench_set |= grams(t)
    return sum(1 for g in grams(doc_text) if g in bench_set)
