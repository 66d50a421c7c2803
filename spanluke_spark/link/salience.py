"""Entity salience — which detected mentions a page is ABOUT, versus
incidental name-drops. KG construction needs this to weight triples
(a judgment naming its own court 14 times from the caption onward vs
citing another court once in passing) and readers of the graph need it
to rank entity results per document.

Interpretable Dunietz-&-Gillick-style positional features, all
relational: mention frequency (log-damped: the 2nd mention says more
than the 30th), first-occurrence position (salient entities appear
early — captions, ledes), and title membership (the strongest single
signal in the salience literature). The score is a fixed formula, not
learned weights, so it replays exactly in SQL and is stable across
engines and cluster sizes:

    salience = (1 + in_title) * ln(1 + n_mentions)
               * (1 - 0.5 * first_pos / doc_len)       [rounded 1e-6]

Shapes: one (doc, entity) hash aggregate over the mention stream, one
equi-join back to the doc table on the same key (co-partitioned — AQE
broadcasts when the doc side is the small one), one per-doc window for
the rank. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_salience(
    mentions: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    entity_col: str = "entity",
    pos_col: str = "start",
    len_col: str = "n_chars",
    title_col: str = "title",
) -> DataFrame:
    """mentions(doc, entity, start) + docs(doc, n_chars, title) ->
    (doc_id, entity, n_mentions, first_pos, in_title, salience, rank):
    per-document entity ranking, deterministic (salience desc, entity
    asc). Mentions past the recorded doc length clamp the position
    ratio at 1 rather than going negative."""
    agg = mentions.groupBy(
        F.col(id_col).alias("doc_id"), F.col(entity_col).alias("entity")
    ).agg(
        F.count(F.lit(1)).alias("n_mentions"),
        F.min(pos_col).alias("first_pos"),
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(len_col).alias("_len"),
        F.col(title_col).alias("_title"),
    )
    j = agg.join(d, "doc_id")
    in_title = (
        F.instr(F.lower("_title"), F.lower(F.col("entity"))) > 0
    ).alias("in_title")
    ratio = F.least(
        F.col("first_pos").cast("double")
        / F.greatest(F.col("_len"), F.lit(1)).cast("double"),
        F.lit(1.0),
    )
    scored = j.select(
        "doc_id",
        "entity",
        "n_mentions",
        "first_pos",
        in_title,
        F.round(
            (1 + in_title.cast("int"))
            * F.log1p(F.col("n_mentions"))
            * (1 - 0.5 * ratio),
            6,
        ).alias("salience"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("salience"), F.asc("entity")
    )
    return scored.withColumn("rank", F.row_number().over(w))
