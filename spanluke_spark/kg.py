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
    lineage_rows_from_written,
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

    # Per-partition page counts, frozen on the driver BEFORE any write
    # (<= n_buckets rows): one column-pruned anti-join scan that doubles as
    # the empty-delta short circuit. Freezing now also sidesteps the
    # stale-read hazard (`todo` lazily re-reads the lineage table, so any
    # post-append recomputation would see an empty delta).
    part_pages = [
        (r["part_key"], r["n"])
        for r in todo.groupBy("part_key").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    n_pages = sum(n for _, n in part_pages)
    if n_pages == 0:
        return {"n_pages": 0, "n_triples": 0, "n_mentions": 0}

    # Fused single Python hop: html -> text -> mentions (html binary never
    # reaches a shuffle; chaining separate extract/score hops measured 3-5x
    # slower at full core width).
    mentions = extract_mentions_from_pages(
        todo, ["url", "part_key"], gazetteer, parallelism=parallelism
    )
    from pyspark.sql import Observation

    obs = Observation(f"kg_mentions_{run_id}")
    mentions = mentions.observe(obs, F.count(F.lit(1)).alias("n_mentions"))
    linked = link_mentions(mentions, alias_dict)
    triples = build_triples(linked)

    # NO persists anywhere below: the delta materializes to STORAGE exactly
    # once (persisting every mention/triple of a 100 TB delta, even
    # MEMORY_AND_DISK, was the r3 scale complaint), and every derived value
    # — lineage metrics included — is computed from the written files.
    if canonicalize:
        from .canon.canonicalize import apply_canonicalization, canonicalize_entities

        # The iterative canonicalization would re-execute the extraction
        # lineage many times, so spill the raw delta to a SIBLING staging
        # dir first (one extraction pass), canonicalize from the read-back.
        # Canonicalize over the FULL accumulated key space (existing triples
        # plus this delta): a delta-only key space can pick a different
        # cluster representative per run and mix canonical subjects. For
        # retroactive convergence of already-written rows run
        # ``recanonicalize`` as a compaction pass.
        staging = os.path.join(out_dir, "_staging_triples")
        triples.write.mode("overwrite").parquet(staging)  # extraction runs here
        delta = spark.read.parquet(staging)
        key_space = delta.select("subj")
        if os.path.exists(triples_path):
            key_space = key_space.unionByName(
                spark.read.parquet(triples_path).select("subj")
            )
        mapping = canonicalize_entities(key_space)
        triples = apply_canonicalization(delta, mapping)

    # Data first, via dynamic partition overwrite; lineage second. A crash
    # between the two leaves committed triples with no lineage row, and the
    # rerun recomputes those partitions and OVERWRITES the same part_key
    # directories — no duplicate triples (exactly-once per partition under
    # crash-rerun; plain append gave only at-least-once).
    overwrite_partitions(triples, triples_path, "part_key")
    if canonicalize:
        import shutil

        shutil.rmtree(os.path.join(out_dir, "_staging_triples"), ignore_errors=True)

    # Lineage from the WRITTEN files (read-back aggregate) + the frozen page
    # counts; collected to the driver (<= n_buckets rows) so the append
    # can't observe post-write state shifting under it.
    lin_rows = lineage_rows_from_written(
        spark, triples_path, part_pages, run_id
    ).collect()
    n_triples = sum(r["n_triples"] for r in lin_rows)
    append_parquet(
        spark.createDataFrame(lin_rows, read_lineage(spark, lineage_path).schema),
        lineage_path,
    )
    return {
        "n_pages": n_pages,
        "n_triples": n_triples,
        # exact pre-dedupe mention count, observed during the single
        # extraction pass (no extra job)
        "n_mentions": int(obs.get["n_mentions"]),
    }


def read_triples(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "triples"))


def run_legal_facts_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    run_id: str = "run0",
    n_buckets: int = 16,
) -> dict:
    """Resumable materialization of the legal surface lanes
    (etl/legalfacts.py one-pass formulation: all twelve lanes in ONE
    scan of the page table) into
    a partitioned facts table with per-partition lineage — the same
    checkpoint-resume discipline as run_kg_pipeline (S7/S8), applied to
    the codegen extraction lanes instead of the span scorer.

    pages: (url, text, ...). Facts land under ``out_dir/facts``
    partitioned by part_key; lineage rows (same schema as the span
    pipeline) under ``out_dir/lineage``. Re-running after a crash
    recomputes only partitions without lineage rows and OVERWRITES their
    directories — exactly-once per partition, no duplicate facts."""
    facts_path = os.path.join(out_dir, "facts")
    lineage_path = os.path.join(out_dir, "lineage")

    from .etl.legalfacts import legal_facts_onepass

    keyed = with_part_key(pages, "url", n_buckets)
    lineage = read_lineage(spark, lineage_path)
    todo = pending_partitions(keyed, lineage)
    part_pages = [
        (r["part_key"], r["n"])
        for r in todo.groupBy("part_key").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    n_pages = sum(n for _, n in part_pages)
    if n_pages == 0:
        return {"n_pages": 0, "n_facts": 0}

    # extraction lanes are scan-side codegen; re-keying the tiny fact
    # relation by url is one hash expression, so part_key never forces
    # the page text through a shuffle
    facts = with_part_key(
        legal_facts_onepass(todo, text_col="text", id_col="url"), "url", n_buckets
    )
    overwrite_partitions(facts, facts_path, "part_key")

    parts = [int(pk) for pk, _ in part_pages]
    agg = (
        spark.read.parquet(facts_path)
        .filter(F.col("part_key").isin(parts))
        .groupBy("part_key")
        .agg(
            F.count(F.lit(1)).alias("n_triples"),
            F.sum(
                F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(2147483647))
            ).alias("checksum"),
            F.countDistinct("url", "lane").alias("n_mentions"),
        )
    )
    p = spark.createDataFrame(
        [(int(pk), int(n)) for pk, n in part_pages], "part_key int, n_pages long"
    )
    lin = p.join(agg, "part_key", "left").select(
        F.lit(run_id).alias("run_id"),
        "part_key",
        "n_pages",
        F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
        F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
        F.coalesce("checksum", F.lit(0)).alias("checksum"),
        F.current_timestamp().alias("completed_at"),
    )
    rows = lin.collect()
    n_facts = sum(r["n_triples"] for r in rows)
    append_parquet(
        spark.createDataFrame(rows, read_lineage(spark, lineage_path).schema),
        lineage_path,
    )
    return {"n_pages": n_pages, "n_facts": n_facts}


def read_legal_facts(spark: SparkSession, out_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_dir, "facts"))


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


def purge_urls(
    spark: SparkSession,
    out_dir: str,
    urls: list[str],
    n_buckets: int = 16,
    run_id: str = "purge0",
    table: str = "facts",
) -> dict:
    """Right-to-be-forgotten retraction over the partitioned facts store:
    delete every fact row for ``urls``, touching ONLY the partitions that
    can hold them (each url maps to one part_key, so a k-url purge
    rewrites <= k partition directories out of the store's thousands —
    never a full-table pass), then append corrective lineage rows so the
    audit trail carries the post-purge counts/checksums and a later
    pipeline rerun still sees the partitions as complete (purged urls are
    NOT re-extracted).

    A partition whose facts are entirely purged is physically removed
    (dynamic overwrite cannot write an empty partition, so the directory
    is deleted through the Hadoop FileSystem API — what an Iceberg
    DELETE's rewrite would do). Returns {n_purged, parts_rewritten,
    parts_deleted}.
    """
    facts_path = os.path.join(out_dir, table)
    lineage_path = os.path.join(out_dir, "lineage")
    purge = with_part_key(
        spark.createDataFrame([(u,) for u in urls], "url string"),
        "url",
        n_buckets,
    )
    parts = [int(r["part_key"]) for r in purge.select("part_key").distinct().collect()]
    if not parts:
        return {"n_purged": 0, "parts_rewritten": 0, "parts_deleted": 0}
    store = spark.read.parquet(facts_path)
    affected = store.where(F.col("part_key").isin(parts))
    survivors = affected.join(purge.select("url"), "url", "left_anti")
    n_before = affected.count()
    per_part = {
        int(r["part_key"]): int(r["n"])
        for r in survivors.groupBy("part_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_purged = n_before - sum(per_part.values())
    if n_purged == 0:
        return {"n_purged": 0, "parts_rewritten": 0, "parts_deleted": 0}
    live = [pk for pk in parts if per_part.get(pk, 0) > 0]
    dead = [pk for pk in parts if per_part.get(pk, 0) == 0]
    if live:
        overwrite_partitions(
            survivors.where(F.col("part_key").isin(live)), facts_path, "part_key"
        )
    if dead:
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        for pk in dead:
            p = jvm.org.apache.hadoop.fs.Path(
                os.path.join(facts_path, f"part_key={pk}")
            )
            p.getFileSystem(conf).delete(p, True)
    # corrective lineage: post-purge counts + checksum per touched
    # partition (n_pages=0 — no pages were processed by the purge).
    # Mention-site identity matches the store flavor: (url, lane) for
    # the legal-facts table, (url, start, end) for span triples.
    post = spark.read.parquet(facts_path).where(F.col("part_key").isin(parts))
    site = (
        ["url", "lane"]
        if "lane" in post.columns
        else (["url", "start", "end"] if "start" in post.columns else ["url"])
    )
    agg = post.groupBy("part_key").agg(
        F.count(F.lit(1)).alias("n_triples"),
        F.sum(
            F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(2147483647))
        ).alias("checksum"),
        F.countDistinct(*site).alias("n_mentions"),
    )
    base = spark.createDataFrame([(pk,) for pk in parts], "part_key int")
    lin = base.join(agg, "part_key", "left").select(
        F.lit(run_id).alias("run_id"),
        "part_key",
        F.lit(0).cast("long").alias("n_pages"),
        F.coalesce("n_mentions", F.lit(0)).alias("n_mentions"),
        F.coalesce("n_triples", F.lit(0)).alias("n_triples"),
        F.coalesce("checksum", F.lit(0)).alias("checksum"),
        F.current_timestamp().alias("completed_at"),
    )
    append_parquet(
        spark.createDataFrame(
            lin.collect(), read_lineage(spark, lineage_path).schema
        ),
        lineage_path,
    )
    return {
        "n_purged": int(n_purged),
        "parts_rewritten": len(live),
        "parts_deleted": len(dead),
    }
