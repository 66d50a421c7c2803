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

    # ONE pass: per mention, emit all families via explode(array(structs)) —
    # a union of three selects would re-execute the (expensive) upstream
    # extraction once per branch unless exchanges happen to be reused.
    fam = F.array(
        F.struct(
            F.col("subj"), F.lit("instance_of").alias("pred"), F.col("label").alias("obj")
        ),
        F.struct(
            F.col("subj"), F.lit("mentioned_in").alias("pred"), F.col("url").alias("obj")
        ),
        F.struct(
            F.concat(F.lit("surf:"), normalize_key("surface")).alias("subj"),
            F.lit("same_as").alias("pred"),
            F.when(
                F.col("canonical_id").isNotNull(),
                F.concat(F.lit("ent:"), F.col("canonical_id").cast("string")),
            ).alias("obj"),
        ),
    )
    triples = (
        base.select(F.explode(fam).alias("t"), "url", "start", "end", *extra)
        .select("t.subj", "t.pred", "t.obj", "url", "start", "end", *extra)
        .filter(F.col("obj").isNotNull())  # drops same_as rows for unlinked mentions
    )
    # Deterministic dedupe: keep the SMALLEST (start, end) provenance per
    # (subj, pred, obj, url) — dropDuplicates keeps an arbitrary duplicate,
    # which made surviving offsets (and any metric derived from the written
    # files, e.g. lineage's distinct-mention-site count) vary with task
    # scheduling.
    return (
        triples.groupBy("subj", "pred", "obj", "url", *extra)
        .agg(F.min(F.struct("start", "end")).alias("_se"))
        .select("subj", "pred", "obj", "url", "_se.start", "_se.end", *extra)
    )
