"""DSIR-style data selection with importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling"): score every
raw-crawl document by how target-domain-like its hashed n-gram distribution
is, then keep the top-k. This is the standard pretraining-data selection
step between quality filtering and dedup in an LLM curation pipeline.

Model: unigram-over-buckets. Both the target corpus and the raw corpus are
reduced to a B-bucket hashed n-gram histogram (B = 4096 default); a
document's log importance weight is

    sum over its n-gram occurrences g of
        ln p_target[h(g) mod B] - ln p_raw[h(g) mod B]

with add-alpha smoothing on both distributions. The hash is the repo's
portable 60-bit md5 hash so the oracle replays bit-for-bit.

Scale shape (100 TB): the two histograms are B-row aggregates (partial
map-side combine; B is thousands, so the shuffle is negligible) and the
log-ratio relation joined into the exploded corpus is broadcast — the
corpus side never shuffles on gram or bucket. The only corpus-sized
exchange is the final per-doc sum, keyed by doc id, and explode keeps a
doc's grams within one partition so the partial aggregate collapses each
doc to one row before the wire. Importance scoring therefore costs one
scan + one doc-keyed reduce regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["word_ngrams_all", "dsir_weights", "dsir_select"]


def word_ngrams_all(text: Column, n: int = 2) -> Column:
    """Word n-grams WITH multiplicity (unlike dedup.word_shingles, which
    dedupes for set-Jaccard): n shifted slices zipped — linear per doc."""
    toks = F.split(F.trim(text), r"\s+")
    k = F.size(toks)
    m = F.greatest(k - n + 1, F.lit(1))
    parts = [F.slice(toks, i + 1, m) for i in range(n)]
    sh = parts[0]
    for p in parts[1:]:
        sh = F.zip_with(sh, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k >= n, sh).otherwise(F.array().cast("array<string>"))


def _bucketed(df: DataFrame, text_col: str, id_col: str, n: int, buckets: int) -> DataFrame:
    return df.select(
        id_col,
        F.explode(word_ngrams_all(F.col(text_col), n)).alias("_gram"),
    ).select(
        id_col,
        F.pmod(portable_hash64(F.col("_gram")), F.lit(buckets)).alias("_bkt"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """-> (id_col, n_grams, log_weight): hashed-ngram importance weight of
    every raw doc with >= n tokens. Higher = more target-like."""
    raw_b = _bucketed(raw, text_col, id_col, n, buckets)
    tgt_b = _bucketed(target, text_col, id_col, n, buckets)

    raw_dist = raw_b.groupBy("_bkt").agg(F.count("*").alias("_cr"))
    tgt_dist = tgt_b.groupBy("_bkt").agg(F.count("*").alias("_ct"))
    raw_tot = raw_dist.agg(F.sum("_cr").alias("_tr"))
    tgt_tot = tgt_dist.agg(F.coalesce(F.sum("_ct"), F.lit(0)).alias("_tt"))

    aB = float(alpha) * buckets
    lr = (
        raw_dist.join(tgt_dist, "_bkt", "left")
        .crossJoin(F.broadcast(raw_tot))
        .crossJoin(F.broadcast(tgt_tot))
        .select(
            "_bkt",
            (
                F.log((F.coalesce(F.col("_ct"), F.lit(0)) + alpha) / (F.col("_tt") + aB))
                - F.log((F.col("_cr") + alpha) / (F.col("_tr") + aB))
            ).alias("_lr"),
        )
    )
    return (
        raw_b.join(F.broadcast(lr), "_bkt")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("_lr").alias("log_weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    buckets: int = 4096,
    alpha: float = 1.0,
) -> DataFrame:
    """Adds ``selected`` (1 for the k most target-like docs, deterministic
    doc-id tie-break). The rank is a single global sort of the tiny
    (id, weight) relation, not of the corpus; at production scale swap the
    exact rank for a weight-threshold quantile if k is a corpus fraction."""
    w = dsir_weights(raw, target, text_col, id_col, n, buckets, alpha)
    # rank on the 6-dp-rounded weight: double sums are accumulation-order
    # dependent (~1e-13 jitter), so ranking raw floats would make the
    # selection boundary run-dependent for near-tied docs. Rounding first
    # collapses jitter-level ties and the id tie-break decides them
    # reproducibly (and identically in the SQL oracle twin).
    rk = Window.orderBy(
        F.round(F.col("log_weight"), 6).desc(), F.col(id_col).asc()
    )
    return w.withColumn(
        "selected",
        (F.row_number().over(rk) <= k).cast("int"),
    )
