"""Triple materialization (north_rule: 'triple extraction ... graph materialize').

Subject identity: canonical entity when linked (``ent:<canonical_id>``),
normalized surface otherwise (``surf:<norm>``). Three triple families:

    (subj, instance_of,  <label>)
    (subj, mentioned_in, <url>)     + provenance char offsets
    (subj, same_as,      ent:<id>)  for surface forms linked to a canonical

Dedupe is scoped to the page partition (part_key) so resumable partitions
stay independent; global dedupe is a read-time/compaction concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..link.alias import normalize_key


def subject_expr() -> F.Column:
    return F.when(
        F.col("canonical_id").isNotNull(),
        F.concat(F.lit("ent:"), F.col("canonical_id").cast("string")),
    ).otherwise(F.concat(F.lit("surf:"), normalize_key("surface")))


def build_triples(linked: DataFrame, extra_cols: list[str] | None = None) -> DataFrame:
    """linked mentions (url, start, end, surface, label, canonical_id,
    canonical_name[, part_key...]) -> deduped triple rows."""
    extra = extra_cols or [c for c in ("part_key",) if c in linked.columns]
    base = linked.withColumn("subj", subject_expr())

    instance_of = base.select(
        "subj",
        F.lit("instance_of").alias("pred"),
        F.col("label").alias("obj"),
        "url",
        "start",
        "end",
        *extra,
    )
    mentioned_in = base.select(
        "subj",
        F.lit("mentioned_in").alias("pred"),
        F.col("url").alias("obj"),
        "url",
        "start",
        "end",
        *extra,
    )
    same_as = (
        base.filter(F.col("canonical_id").isNotNull())
        .select(
            F.concat(F.lit("surf:"), normalize_key("surface")).alias("subj"),
            F.lit("same_as").alias("pred"),
            F.concat(F.lit("ent:"), F.col("canonical_id").cast("string")).alias("obj"),
            "url",
            "start",
            "end",
            *extra,
        )
    )
    triples = instance_of.unionByName(mentioned_in).unionByName(same_as)
    return triples.dropDuplicates(["subj", "pred", "obj", "url"])
