"""Parallel-corpus (bitext) mining — CCMatrix/LASER-style: find
cross-language document pairs whose embeddings agree, the standard way
multilingual training corpora are mined from a crawl at 10^9+ docs.

The pipeline shape is blocker -> verifier:

* candidates come from ANY pair generator (at scale: link/ann.py LSH
  buckets or the margin-kNN index; in tests: a deterministic offset
  pairing) — this module never enumerates all pairs;
* verification computes cosine on the INT8-QUANTIZED vectors
  (link/quantize.py): the dot product and both norms are integer
  folds (exact, order-free in every engine — unlike float sums), so
  the accept/reject decision is bit-reproducible across reruns,
  executors, AND the SQL oracle; int8 cosine tracks float cosine to
  ~1e-2, far tighter than any useful mining threshold;
* gates: different languages, embedding similarity >= ``threshold``,
  and the classic length-ratio prior (a 5:1 length mismatch is not a
  translation, whatever the embeddings say).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..link.quantize import quantize_int8


def _int_dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def mine_bitext(
    docs: DataFrame,
    emb: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.5,
    max_length_ratio: float = 2.0,
) -> DataFrame:
    """docs(doc_id, lang, n_chars) x emb(vec_id, embedding) x
    candidates(id_a, id_b) -> (id_a, id_b, lang_a, lang_b, sim):
    accepted cross-language pairs with their int8-cosine similarity."""
    q = quantize_int8(emb).select(
        "vec_id", "q", _int_dot(F.col("q"), F.col("q")).alias("norm2")
    )
    meta = docs.select("doc_id", "lang", "n_chars")

    pairs = (
        candidates.join(
            q.select(
                F.col("vec_id").alias("id_a"),
                F.col("q").alias("qa"),
                F.col("norm2").alias("na2"),
            ),
            "id_a",
        )
        .join(
            q.select(
                F.col("vec_id").alias("id_b"),
                F.col("q").alias("qb"),
                F.col("norm2").alias("nb2"),
            ),
            "id_b",
        )
        .join(
            meta.select(
                F.col("doc_id").alias("id_a"),
                F.col("lang").alias("lang_a"),
                F.col("n_chars").alias("len_a"),
            ),
            "id_a",
        )
        .join(
            meta.select(
                F.col("doc_id").alias("id_b"),
                F.col("lang").alias("lang_b"),
                F.col("n_chars").alias("len_b"),
            ),
            "id_b",
        )
    )
    sim = F.try_divide(
        _int_dot(F.col("qa"), F.col("qb")),
        F.sqrt(F.col("na2").cast("double") * F.col("nb2").cast("double")),
    )
    ratio = F.greatest("len_a", "len_b") / F.least("len_a", "len_b")
    return (
        pairs.withColumn("sim", sim)
        .where(
            (F.col("lang_a") != F.col("lang_b"))
            & (F.col("sim") >= threshold)
            & (ratio <= max_length_ratio)
        )
        .select("id_a", "id_b", "lang_a", "lang_b", "sim")
    )
