"""Structured-Streaming surface (SURVEY.md §2.11).

The reference is batch-only; the graft's streaming story is incremental page
ingestion: readStream over the pages table -> watermarked tumbling-window
aggregation -> foreachBatch writing triples idempotently keyed by partition,
giving the exact same exactly-once resume semantics as the batch lineage
mechanism (storage/lineage.py). Late pages beyond the watermark are dropped
and counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph.triples import build_triples
from ..link.alias import link_mentions
from ..ner.scorer import Gazetteer
from ..pipeline import extract_mentions_from_pages
from ..storage.lineage import with_part_key


def read_page_stream(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Incremental page source: file-based streaming read of the pages table
    (swap for readStream.table(...) on an Iceberg catalog)."""
    sch = schema or "url string, warc_ts timestamp, html binary, text string, lang string"
    return spark.readStream.schema(sch).parquet(path)


def windowed_page_counts(pages: DataFrame, window: str = "1 day", watermark: str = "1 hour") -> DataFrame:
    """Watermarked tumbling-window ingestion stats per language.

    Late pages beyond the watermark are dropped by the engine; the counts per
    closed window are final — the streaming analogue of per-partition lineage.
    """
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


def sessionized_counts(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """NATIVE session windows (``F.session_window``): events within ``gap``
    of each other merge into one dynamic-length session per key — the
    engine manages the merging state, the watermark closes sessions whose
    gap has provably expired (append-mode emits only closed sessions).

    Per Spark semantics ``session_end`` = last event time + gap (the
    exclusive close bound). Works identically on a static DataFrame —
    which is how q68's DuckDB gaps-and-islands oracle verifies the exact
    same expression batch-side."""
    return (
        events.withWatermark(ts, watermark)
        .groupBy(F.session_window(F.col(ts), gap).alias("w"), F.col(key))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: right rows matched to left rows with the
    same key and ``left_ts <= right_ts <= left_ts + within`` — the classic
    watermarked interval join (e.g. purchases attributed to the click that
    preceded them). Both sides carry watermarks and the join condition
    bounds event-time distance, so the engine can expire buffered state —
    REQUIRED for append-mode stream-stream joins; without the time bound
    state grows forever. Same expression works batch-side (q69 oracle)."""
    overlap = (set(left.columns) & set(right.columns)) - {key}
    if overlap:
        raise ValueError(
            f"rename overlapping non-key columns before joining: {sorted(overlap)}"
        )
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond).select(
        F.col(f"l.{key}").alias(key),
        *[F.col(f"l.{c}").alias(c) for c in left.columns if c != key],
        *[F.col(f"r.{c}").alias(c) for c in right.columns if c != key],
    )


def sliding_entity_counts(
    mentions: DataFrame,
    entity: str = "entity",
    ts: str = "ts",
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked SLIDING-window mention counts per entity — the
    trending-detection primitive (each event lands in window/slide
    overlapping windows, so a burst registers the moment it starts, not
    at the next tumbling boundary). Append mode emits each window once,
    when the watermark closes it. The same expression runs batch-side,
    which is how q196's oracle replays the epoch-aligned window
    assignment exactly."""
    return (
        mentions.withWatermark(ts, watermark)
        .groupBy(F.window(F.col(ts), window, slide).alias("w"), F.col(entity))
        .agg(F.count(F.lit(1)).alias("n_mentions"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            entity,
            "n_mentions",
        )
    )


def top_k_per_window(counts: DataFrame, k: int = 3,
                     entity: str = "entity") -> DataFrame:
    """Closed-window counts -> the k most-mentioned entities per window
    (count desc, entity asc — fully deterministic). Ranking is a batch
    transform by design: rank-over-window after a streaming aggregation
    is not append-mode expressible, so trending pipelines rank in the
    foreachBatch consumer or over the sink table — exactly where this
    composes."""
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc("n_mentions"), F.asc(entity)
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def stateful_lang_totals(pages: DataFrame):
    """Custom stateful streaming operator (applyInPandasWithState): running
    cumulative page count per language, state carried ACROSS micro-batches
    (the building block for streaming dedupe counters / quota enforcement).
    Emits one updated (lang, n_pages) row per group per batch; the latest
    row per lang is the running total. Checkpointed group state — recovery
    resumes the count, unlike a stateless per-batch aggregate."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdfs:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"lang": [key[0]], "n_pages": [total]})

    return pages.groupBy("lang").applyInPandasWithState(
        _update,
        outputStructType="lang string, n_pages long",
        stateStructType="n long",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def make_batch_processor(
    gazetteer: Gazetteer, alias_dict: DataFrame, out_dir: str, n_buckets: int = 16
):
    """The foreachBatch body as a standalone callable so the epoch-replay
    idempotence contract is directly testable (call it twice with the same
    epoch_id — the table must be byte-identical)."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        from ..storage.lineage import overwrite_partitions

        keyed = with_part_key(batch_df, "url", n_buckets)
        mentions = extract_mentions_from_pages(keyed, ["url", "part_key"], gazetteer)
        linked = link_mentions(mentions, alias_dict)
        triples = build_triples(linked).withColumn("epoch", F.lit(epoch_id))
        overwrite_partitions(triples, f"{out_dir}/triples", ["epoch", "part_key"])

    return _process


def make_legal_facts_processor(out_dir: str, n_buckets: int = 16):
    """foreachBatch body for the legal surface lanes (etl/legalfacts.py
    one-pass twelve-lane formulation — one scan per micro-batch) ->
    dynamic partition overwrite keyed by (epoch, part_key) — the same
    exactly-once-per-epoch contract as make_batch_processor, directly
    testable by replaying an epoch."""

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        from ..etl.legalfacts import legal_facts_onepass
        from ..storage.lineage import overwrite_partitions

        facts = legal_facts_onepass(batch_df, text_col="text", id_col="url")
        keyed = with_part_key(facts, "url", n_buckets).withColumn(
            "epoch", F.lit(epoch_id)
        )
        overwrite_partitions(keyed, f"{out_dir}/facts", ["epoch", "part_key"])

    return _process


def streaming_legal_facts(
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    checkpoint_dir: str | None = None,
):
    """pages stream -> legal facts, written idempotently per epoch (the
    streaming twin of kg.run_legal_facts_pipeline; availableNow trigger
    drains the backlog then stops, the incremental-crawl mode)."""
    writer = (
        pages.writeStream.outputMode("update")
        .foreachBatch(make_legal_facts_processor(out_dir, n_buckets))
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def streaming_kg_query(
    pages: DataFrame,
    gazetteer: Gazetteer,
    alias_dict: DataFrame,
    out_dir: str,
    n_buckets: int = 16,
    checkpoint_dir: str | None = None,
):
    """pages stream -> mentions -> triples, written idempotently per batch.

    Exactly-once per epoch: the sink write is a DYNAMIC PARTITION OVERWRITE
    keyed by (epoch, part_key), so a foreachBatch epoch replayed after a
    failure between the write and the checkpoint commit rewrites its own
    epoch partitions instead of appending duplicates (a plain append gave
    only at-least-once). Identical contract to batch resume (SURVEY §2.11,
    storage/lineage.overwrite_partitions).
    """
    writer = (
        pages.writeStream.outputMode("update")
        .foreachBatch(make_batch_processor(gazetteer, alias_dict, out_dir, n_buckets))
        .trigger(availableNow=True)
    )
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer


def streaming_dedup(
    pages: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "warc_ts",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: drop re-crawled pages whose dedup key was
    already seen, with BOUNDED state — dropDuplicatesWithinWatermark keeps a
    key in the state store only until the watermark passes it, so state size
    tracks the watermark window, not the whole history (the only viable shape
    at 10^12 pages; plain dropDuplicates on a stream grows state forever).

    Default key: content hash + length of the extracted text (the streaming
    twin of dedup.exact_dedup(by_hash=True)) — 16 bytes of state per page.
    """
    if key_cols is None:
        norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        pages = pages.withColumn("_dk_h", F.xxhash64(norm)).withColumn(
            "_dk_len", F.length(norm)
        )
        key_cols = ["_dk_h", "_dk_len"]
    return (
        pages.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(key_cols)
        .drop("_dk_h", "_dk_len")
    )


def streaming_triple_upsert(triples: DataFrame) -> DataFrame:
    """Incremental latest-wins KG maintenance (the streaming twin of
    graph/snapshot.latest_snapshot): per (subj, pred), keep the
    observation with the greatest (warc_ts, obj) ACROSS micro-batches in
    checkpointed group state, and emit a row ONLY when the snapshot value
    actually changes — re-observations of the current fact are suppressed
    (the upsert contract a downstream KG store wants; 10^12 no-op
    re-crawls must not become 10^12 writes).

    State per group: one (ts, obj) pair — bounded by the number of LIVE
    (subj, pred) keys, not by history. The per-batch reduction is a
    vectorized pandas sort+tail, not a row loop. Expects
    (subj string, pred string, obj string, warc_ts long) rows.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        prev = tuple(state.get) if state.exists else None
        best = prev
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            top = pdf.sort_values(["warc_ts", "obj"]).iloc[-1]
            cand = (int(top["warc_ts"]), str(top["obj"]))
            if best is None or cand > best:
                best = cand
        if best is not None and best != prev:
            state.update(best)
            yield pd.DataFrame(
                {
                    "subj": [key[0]],
                    "pred": [key[1]],
                    "obj": [best[1]],
                    "warc_ts": [best[0]],
                }
            )

    return triples.groupBy("subj", "pred").applyInPandasWithState(
        _update,
        outputStructType="subj string, pred string, obj string, warc_ts long",
        stateStructType="ts long, obj string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def read_signature_index(
    spark: SparkSession, idx_path: str, before_epoch: int | None = None
) -> DataFrame | None:
    """The stream's signature index, collapsed to the LATEST row per id.

    An upserted re-crawl (same id, changed text, survived dedup) writes a
    fresh signature under its admitting epoch; the stale row stays in the
    old epoch partition (epoch partitions are immutable except under their
    own replay) and loses the max_by here. ``before_epoch`` restricts to
    rows admitted strictly earlier — what a replayed epoch must see."""
    import os

    if not os.path.exists(idx_path):
        return None
    idx = spark.read.parquet(idx_path)
    if before_epoch is not None:
        idx = idx.filter(F.col("epoch") < before_epoch)
    sig_cols = [c for c in idx.columns if c not in ("id", "epoch")]
    latest = idx.groupBy("id").agg(
        F.max_by(F.struct(*sig_cols), F.col("epoch")).alias("_s")
    )
    return latest.select("id", "_s.*")


def make_incremental_dedup_processor(
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
):
    """foreachBatch body: NEAR-dup dedup across the whole stream history via
    the signature index (dedup/incremental.py) — the streaming twin of
    continuous-crawl dedup. State = parquet signature index rows tagged with
    the epoch that admitted them; reads collapse to the latest row per id
    (``read_signature_index``).

    Exactly-once under epoch replay: each call reads only index rows with
    epoch < epoch_id (a replayed epoch never sees its own partial output),
    and both sinks (kept docs, index delta) are dynamic partition overwrites
    keyed by epoch — the replay rewrites its own partitions bit-identically.

    The epoch's index delta is the batch's OWN kept signatures (semi-join on
    batch ids) — NOT ``new_index`` minus prior ids, which silently dropped
    the upsert case: a re-crawled id whose changed text survives dedup must
    land its NEW signature in the index, else future near-copies of the new
    text keep slipping past the dedup.
    """
    import os

    def _process(batch_df: DataFrame, epoch_id: int) -> None:
        from ..dedup.incremental import incremental_dedup
        from ..storage.lineage import overwrite_partitions

        spark = batch_df.sparkSession
        idx_path = os.path.join(out_dir, "sig_index")
        index = read_signature_index(spark, idx_path, before_epoch=epoch_id)
        kept, new_index = incremental_dedup(
            batch_df, index, id_col=id_col, text_col=text_col, threshold=threshold
        )
        delta = new_index.join(
            batch_df.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
        overwrite_partitions(
            kept.withColumn("epoch", F.lit(epoch_id)), os.path.join(out_dir, "kept"), "epoch"
        )
        overwrite_partitions(
            delta.withColumn("epoch", F.lit(epoch_id)), idx_path, "epoch"
        )

    return _process
