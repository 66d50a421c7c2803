"""Cross-snapshot content novelty — the crawl-budget question every
recurring crawl asks: how much of snapshot s's content was never seen
in ANY earlier snapshot? (The Common-Crawl novelty curve: successive
monthly crawls re-fetch mostly-known content; the novelty rate decides
whether the next crawl is worth its budget, and which sources earn
deeper re-crawls.)

Content identity is the word k-gram (the decontamination/substring-dedup
unit, not whole-page hashes — a boilerplate-wrapped page with one new
paragraph still contributes its new grams). Relational shape: distinct
(snapshot, gram) pairs (one map-side-combinable distinct), each gram's
FIRST snapshot (one min agg), and per-snapshot totals vs first-seen
counts joined on the snapshot key — the corpus text never shuffles,
only (snapshot, gram-hash) pairs do. Grams are hashed to 64-bit before
shuffling so the wide text leaves the scan immediately.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..dedup.dedup import portable_hash64

__all__ = ["snapshot_novelty"]


def snapshot_novelty(
    docs: DataFrame,
    snapshot_col: str = "snapshot",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """(snapshot, text) -> (snapshot, n_grams, n_novel, novelty_rate):
    distinct word-k-gram count per snapshot, how many of them first
    appear in that snapshot, and the ratio. Snapshots are ordered by
    their natural (numeric/lexicographic) order; the earliest snapshot
    is 100% novel by construction."""
    words = F.split(F.col(text_col), " ")
    # guard: Spark's sequence(1, n) DESCENDS when n < 1, so short texts
    # must produce an explicitly empty position list
    positions = F.when(
        F.size(words) >= k, F.sequence(F.lit(1), F.size(words) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(
        positions,
        lambda i: portable_hash64(F.array_join(F.slice(words, i, k), " ")),
    )
    # ONE linear chain — the gram relation is consumed exactly once (a
    # branch for totals + a branch for first-seen would re-run the whole
    # explode+distinct upstream twice, measured 13.5x super-linear at
    # sf1). Per gram the snapshot SET is collected (bounded by the
    # snapshot count, a handful), the min is its first appearance, and
    # one explode + one tiny aggregate yields totals and novel counts
    # together: a gram counts as novel exactly in its min snapshot.
    sg = docs.select(
        F.col(snapshot_col).alias("s"),
        F.explode(F.array_distinct(grams)).alias("g"),
    )
    per_gram = sg.groupBy("g").agg(
        F.min("s").alias("first_s"), F.collect_set("s").alias("ss")
    )
    per_snap = (
        per_gram.select("first_s", F.explode("ss").alias("s"))
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("s") == F.col("first_s")).cast("long")).alias("n_novel"),
        )
    )
    return per_snap.select(
        F.col("s").alias(snapshot_col),
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty_rate"),
    )
