"""Anchor-text entity disambiguation — the classic two-signal linker
(Milne & Witten 2008, "Learning to Link with Wikipedia"; the commonness ×
context-relatedness family every production entity linker starts from):

    score(mention, e) = commonness(e | anchor) * jaccard(context, profile)

- commonness comes from the anchor-statistics dictionary (what q77 mines
  from the crawl): P(e | anchor) = cnt(anchor→e) / Σ_e' cnt(anchor→e');
- relatedness is the Jaccard overlap between the mention's context terms
  and the candidate's profile terms.

Scale shape: the anchor dictionary is the small side and is BROADCAST
onto the mention stream (the q25/J7 alias-join pattern — mentions never
shuffle for candidate generation); the overlap is an equi-join on the
term keyed by candidate pair, aggregated map-side; the winner per mention
is a WindowGroupLimit top-1 with a deterministic (score DESC, entity ASC)
tie-break. Scores are rounded to 1e-6 BEFORE the argmax so the ranking is
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["disambiguate"]


def disambiguate(
    mentions: DataFrame,
    anchor_stats: DataFrame,
    mention_terms: DataFrame,
    entity_terms: DataFrame,
) -> DataFrame:
    """-> (mention_id, entity, commonness, relatedness, score): the best
    candidate per mention.

    mentions = (mention_id, anchor); anchor_stats = (anchor, entity, cnt);
    mention_terms = (mention_id, term); entity_terms = (entity, term).
    Mentions whose anchor has no dictionary entry yield no row (NIL);
    a candidate with zero context overlap scores 0 and can still win if
    every candidate has zero overlap (commonness breaks the tie).
    """
    totals = Window.partitionBy("anchor")
    dict_df = anchor_stats.withColumn(
        "commonness", F.col("cnt") / F.sum("cnt").over(totals)
    ).select("anchor", "entity", "commonness")

    cands = mentions.join(F.broadcast(dict_df), "anchor").select(
        "mention_id", "entity", "commonness"
    )

    msize = mention_terms.groupBy("mention_id").agg(F.count("*").alias("n_m"))
    esize = entity_terms.groupBy("entity").agg(F.count("*").alias("n_e"))
    inter = (
        cands.select("mention_id", "entity")
        .join(mention_terms, "mention_id")
        .join(entity_terms, ["entity", "term"])
        .groupBy("mention_id", "entity")
        .agg(F.count("*").alias("inter"))
    )

    scored = (
        cands.join(inter, ["mention_id", "entity"], "left")
        .join(msize, "mention_id")
        .join(esize, "entity")
        .withColumn("inter", F.coalesce(F.col("inter"), F.lit(0)))
        .withColumn(
            "relatedness",
            F.round(
                F.col("inter")
                / (F.col("n_m") + F.col("n_e") - F.col("inter")),
                6,
            ),
        )
        .withColumn("commonness", F.round("commonness", 6))
        .withColumn(
            "score", F.round(F.col("commonness") * F.col("relatedness"), 6)
        )
    )
    w = Window.partitionBy("mention_id").orderBy(
        F.col("score").desc(), F.col("commonness").desc(), F.col("entity")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("mention_id", "entity", "commonness", "relatedness", "score")
    )
