"""Burrows' Delta authorship attribution (Burrows 2002; Evert et al.
2017) — the standard stylometric distance: which source/author
profile does a disputed document sit closest to, measured on the
z-scored relative frequencies of the corpus's MOST FREQUENT words
(function words — style, not topic)? The provenance-audit companion
of the marketing attribution lane (q233) and langid (q16): crawl
dedup often needs "same author/template?" when URLs and hashes
disagree.

  f_dw   = count(w in d) / len(d)          (relative frequency)
  z_dw   = (f_dw - mu_w) / sigma_w         (per-word corpus z-score,
                                            population sigma)
  Delta(d, A) = mean_w | z_dw - mean_{d' in A} z_d'w |

This is a FLOAT lane (the kaplan_meier convention, stated): sigma is
a square root, so the engine computes in IEEE doubles and rounds the
final Delta to 1e-6 — both engines evaluate the identical expression
tree on the identical once-aggregated integers, so the rounded
values agree (every upstream count is exact). Determinism: the top-K
word panel breaks count ties by word ascending; zero-variance panel
words are DROPPED and counted (k_eff — the q347 skip-and-count
convention) since their z is undefined.

Identities pytest-pinned: a document's Delta to the centroid of a
singleton author holding only itself is exactly 0; Delta is
invariant under document duplication of every author's corpus;
adding a constant word to every document shifts no z-score.

Distributed shape: one tokenize-explode aggregate to (doc, word)
counts, a K-row broadcast panel (top-K is a dimension, K fixed),
the dense doc x panel grid via broadcast join (missing cell = 0),
two tiny per-word/per-author aggregates, one final mean-abs
aggregate. The corpus-sized stages are the first aggregate and the
grid join — both linear, both broadcast-joined on the K-row side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["burrows_delta"]


def burrows_delta(
    docs: DataFrame,
    k_top: int = 10,
    id_col: str = "doc_id",
    author_col: str = "author",
    text_col: str = "text",
) -> DataFrame:
    """docs (doc_id, author, text) -> one row per (doc_id, candidate)
    author profile: (doc_id, candidate, k_eff, delta); delta rounded
    to 1e-6."""
    base = docs.select(
        F.col(id_col).alias("doc"),
        F.col(author_col).alias("author"),
        F.col(text_col).alias("text"),
    ).localCheckpoint(eager=True)
    toks = base.select(
        "doc",
        F.explode(F.split(F.col("text"), r"\s+")).alias("w"),
    ).where(F.col("w") != "")
    counts = toks.groupBy("doc", "w").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    lens = counts.groupBy("doc").agg(F.sum("c").alias("len"))
    panel = (
        counts.groupBy("w")
        .agg(F.sum("c").alias("tot"))
        .orderBy(F.col("tot").desc(), F.col("w").asc())
        .limit(k_top)
        .select("w")
    )
    grid = (
        lens.crossJoin(F.broadcast(panel))
        .join(counts, ["doc", "w"], "left")
        .select(
            "doc",
            "w",
            (
                F.coalesce(F.col("c"), F.lit(0)) / F.col("len")
            ).alias("f"),
        )
    )
    word_stats = grid.groupBy("w").agg(
        F.avg("f").alias("mu"), F.stddev_pop("f").alias("sigma")
    )
    z = (
        grid.join(F.broadcast(word_stats), "w")
        .where(F.col("sigma") > 0)
        .select(
            "doc",
            "w",
            ((F.col("f") - F.col("mu")) / F.col("sigma")).alias("z"),
        )
    )
    cent = (
        z.join(
            F.broadcast(base.select("doc", "author")), "doc"
        )
        .groupBy("author", "w")
        .agg(F.avg("z").alias("cz"))
        .withColumnRenamed("author", "candidate")
    )
    pairs = z.join(F.broadcast(cent), "w").groupBy(
        "doc", "candidate"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k_eff"),
        F.avg(F.abs(F.col("z") - F.col("cz"))).alias("_d"),
    )
    return pairs.select(
        F.col("doc").alias("doc_id"),
        "candidate",
        "k_eff",
        F.round("_d", 6).alias("delta"),
    )
