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


def benchmark_ngrams(
    bench: DataFrame, n: int = DEFAULT_N, text_col: str = "text"
) -> DataFrame:
    """Distinct hashed word n-grams of the evaluation texts -> (h: long).
    The broadcastable contamination fingerprint of the benchmark."""
    return (
        bench.select(F.explode(word_shingles(F.col(text_col), n)).alias("_g"))
        .select(F.xxhash64("_g").alias("h"))
        .distinct()
    )


def flag_contaminated(
    docs: DataFrame,
    bench_grams: DataFrame,
    n: int = DEFAULT_N,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs + (n_hits: matching benchmark n-grams, contaminated: bool).

    A doc shorter than ``n`` words has no n-grams and can never be flagged
    (matching the reference rule: overlap is defined on full n-grams)."""
    hits = (
        docs.select(
            F.col(id_col).alias("_id"),
            F.explode(word_shingles(F.col(text_col), n)).alias("_g"),
        )
        .select("_id", F.xxhash64("_g").alias("h"))
        .join(F.broadcast(bench_grams), "h", "left_semi")
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
) -> DataFrame:
    """Training docs minus those sharing >= ``min_hits`` word n-grams with
    the benchmark — document-level removal (the Llama/FineWeb policy; the
    windowed-span excision variant composes from ``flag_contaminated`` +
    ``chunking`` if partial salvage is ever preferred)."""
    flagged = flag_contaminated(docs, benchmark_ngrams(bench, n, text_col), n, id_col, text_col)
    return flagged.filter(F.col("n_hits") < min_hits).drop("n_hits", "contaminated")


def py_ngram_overlap(doc_text: str, bench_texts: list[str], n: int = DEFAULT_N) -> int:
    """Pure-Python oracle: # of doc word-n-grams present in the benchmark."""
    def grams(t: str) -> set[tuple[str, ...]]:
        ws = t.split()
        return {tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)}

    bench_set: set[tuple[str, ...]] = set()
    for t in bench_texts:
        bench_set |= grams(t)
    return sum(1 for g in grams(doc_text) if g in bench_set)
