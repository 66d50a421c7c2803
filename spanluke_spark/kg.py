"""The composed KG-construction pipeline (north_rule, end to end):

    pages -> [resume anti-join] -> extract text -> extract mentions
          -> link (broadcast alias) -> triples -> write partitioned
          -> lineage rows

One logical plan per run; Catalyst executes it as ~4 stages. The only
shuffles: extraction repartition (size-balancing), triple dedupe, lineage agg.
Resume: partitions present in the lineage table are skipped via left_anti —
re-running after a crash is idempotent per partition.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .graph.triples import build_triples
from .link.alias import link_mentions
from .ner.scorer import Gazetteer
from .pipeline import extract_mentions_from_pages
from .storage.lineage import (
    append_parquet,
    lineage_rows,
    overwrite_partitions,
    pending_partitions,
    read_lineage,
    with_part_key,
)


def run_kg_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    gazetteer: Gazetteer,
    alias_dict: DataFrame,
    out_dir: str,
    run_id: str = "run0",
    n_buckets: int = 16,
    parallelism: int | None = None,
    canonicalize: bool = False,
) -> dict:
    """Execute one (resumable) pass. Returns counters for the processed delta."""
    triples_path = os.path.join(out_dir, "triples")
    lineage_path = os.path.join(out_dir, "lineage")

    keyed = with_part_key(pages, "url", n_buckets)
    lineage = read_lineage(spark, lineage_path)
    todo = pending_partitions(keyed, lineage)

    # Empty-delta short circuit: a fully-resumed run must cost one anti-join
    # scan (no Python stage, no canonicalization over the accumulated table,
    # no writes). Counting BEFORE any write is safe — the stale-read hazard
    # the later todo.count() comment describes only exists after the lineage
    # append.
    n_pages = todo.count()
    if n_pages == 0:
        return {"n_pages": 0, "n_triples": 0}

    # Fused single Python hop: html -> text -> mentions (html binary never
    # reaches a shuffle; chaining separate extract/score hops measured 3-5x
    # slower at full core width).
    mentions = extract_mentions_from_pages(
        todo, ["url", "part_key"], gazetteer, parallelism=parallelism
    )
    linked = link_mentions(mentions, alias_dict)
    triples = build_triples(linked)
    if canonicalize:
        from .canon.canonicalize import apply_canonicalization, canonicalize_entities

        # Canonicalize over the FULL accumulated key space (existing triples
        # plus this delta), not the delta alone: otherwise a resumed run can
        # pick a different cluster representative and mix canonical subjects
        # across runs. For retroactive convergence of already-written rows
        # (a new run adding a smaller min-key to an old cluster), run
        # ``recanonicalize`` as a compaction pass.
        key_space = triples.select("subj")
        if os.path.exists(triples_path):
            key_space = key_space.unionByName(
                spark.read.parquet(triples_path).select("subj")
            )
        mapping = canonicalize_entities(key_space)
        triples = apply_canonicalization(triples, mapping)

    # Materialize the full delta BEFORE any append: `todo` lazily re-reads the
    # lineage table, so counting it after the lineage write would see the new
    # rows and report an empty delta (and lineage metrics would recompute the
    # extraction). persist + eager count pins every derived value first.
    mentions.persist()
    triples.persist()
    n_triples = triples.count()
    if n_pages:
        lin = lineage_rows(
            triples,
            todo.select("part_key"),
            mentions.select("part_key"),
            run_id,
        ).persist()
        lin.count()  # eager: computed from pre-append state
        # Data first, via dynamic partition overwrite; lineage second. A
        # crash between the two leaves committed triples with no lineage
        # row, and the rerun recomputes those partitions and OVERWRITES the
        # same part_key directories — no duplicate triples (exactly-once per
        # partition under crash-rerun; plain append gave only at-least-once).
        overwrite_partitions(triples, triples_path, "part_key")
        append_parquet(lin, lineage_path)
        lin.unpersist()
    mentions.unpersist()
    triples.unpersist()
    return {"n_pages": n_pages, "n_triples": n_triples}


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "triples"))


def recanonicalize(spark: SparkSession, out_dir: str) -> int:
    """Compaction pass: canonicalize over the FULL accumulated triples table
    and rewrite it, converging subjects that were canonicalized against
    different (smaller) key spaces in earlier incremental runs. Returns the
    post-compaction row count. Read-time alternative: apply the mapping in a
    view instead of rewriting (graph/triples.py does this for dedupe)."""
    from .canon.canonicalize import apply_canonicalization, canonicalize_entities

    triples_path = os.path.join(out_dir, "triples")
    triples = spark.read.parquet(triples_path)
    mapping = canonicalize_entities(triples)
    out = apply_canonicalization(triples, mapping)
    # full rewrite: stage in memory is unsafe at scale, so write to a swap
    # directory and atomically rename (same filesystem).
    tmp_path = triples_path + "._compact"
    out.write.mode("overwrite").partitionBy("part_key").parquet(tmp_path)
    n = spark.read.parquet(tmp_path).count()
    import shutil

    old_path = triples_path + "._old"
    os.rename(triples_path, old_path)
    os.rename(tmp_path, triples_path)
    shutil.rmtree(old_path)
    return n
