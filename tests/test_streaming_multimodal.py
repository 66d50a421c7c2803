"""Structured Streaming surface + multimodal plumbing tests."""

import pytest
from pyspark.sql import functions as F

from spanluke_spark.etl.pages import synthesize_pages
from spanluke_spark.fixtures import PIPELINE_GAZETTEER
from spanluke_spark.multimodal.media import (
    extract_media_features,
    frame_sample_plan,
    synthesize_media,
)
from spanluke_spark.streaming.stream import (
    read_page_stream,
    streaming_kg_query,
    windowed_page_counts,
)


@pytest.fixture()
def pages_dir(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    path = str(tmp_path / "pages_parquet")
    synthesize_pages(docs).repartition(4).write.parquet(path)
    return path


def test_windowed_page_counts_batch_parity(spark, pages_dir, tmp_path):
    """Streaming windowed counts == the equivalent batch aggregation."""
    stream = read_page_stream(spark, pages_dir)
    agg = windowed_page_counts(stream, window="1 hour", watermark="30 minutes")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("wincounts")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.window_start, r.lang): r.n_pages
        for r in spark.sql("SELECT * FROM wincounts").collect()
    }
    batch = spark.read.parquet(pages_dir)
    expected = {
        (r.ws, r.lang): r.n
        for r in batch.groupBy(
            F.window("warc_ts", "1 hour").alias("w"), "lang"
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "lang", F.col("n"))
        .collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_kg_matches_batch(spark, pages_dir, tmp_path):
    """foreachBatch triple stream == batch pipeline output (exactly-once)."""
    alias_df = spark.createDataFrame(
        [("hash join", 10, "Hash Join", "COURT", 0.9), ("spark", 12, "Apache Spark", "ORG", 0.9)],
        "alias string, canonical_id long, canonical_name string, entity_type string, prior double",
    )
    out = str(tmp_path / "stream_kg")
    stream = read_page_stream(spark, pages_dir)
    q = streaming_kg_query(
        stream, PIPELINE_GAZETTEER, alias_df, out, checkpoint_dir=str(tmp_path / "ckpt")
    ).start()
    q.processAllAvailable()
    q.stop()
    streamed = spark.read.parquet(f"{out}/triples")
    # batch equivalent over the same pages
    from spanluke_spark.graph.triples import build_triples
    from spanluke_spark.link.alias import link_mentions
    from spanluke_spark.pipeline import extract_mentions_from_pages
    from spanluke_spark.storage.lineage import with_part_key

    keyed = with_part_key(spark.read.parquet(pages_dir), "url", 16)
    expected = build_triples(
        link_mentions(
            extract_mentions_from_pages(keyed, ["url", "part_key"], PIPELINE_GAZETTEER), alias_df
        )
    )
    s = {(r.subj, r.pred, r.obj, r.url) for r in streamed.collect()}
    e = {(r.subj, r.pred, r.obj, r.url) for r in expected.collect()}
    assert s == e and len(s) > 0


def test_media_features_deterministic(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    media = synthesize_media(docs)
    f1 = {r.media_id: list(r.features) for r in extract_media_features(media.coalesce(1)).collect()}
    f2 = {r.media_id: list(r.features) for r in extract_media_features(media.repartition(8)).collect()}
    assert f1 == f2 and len(f1) == 60
    assert all(len(v) == 16 for v in f1.values())
    sizes = {r.media_id: r.n_bytes for r in extract_media_features(media).collect()}
    raw = {r.doc_id: r.n_chars for r in docs.collect()}
    assert all(sizes[k] == raw[k] for k in raw)  # payload plumbed intact (ascii)


def test_media_decode_stub_raises(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(2)
    media = synthesize_media(docs)
    with pytest.raises(Exception) as exc_info:
        extract_media_features(media, deterministic_fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "codec" in str(exc_info.value)


def test_frame_sample_plan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(30)
    media = synthesize_media(docs)
    plan = frame_sample_plan(media, every_ms=5000)
    rows = plan.collect()
    vids = {r.media_id for r in media.filter(F.col("kind") == "video").collect()}
    assert {r.media_id for r in rows} == vids
    for r in rows:
        assert r.frame_ts_ms == r.frame_idx * 5000


def test_epoch_replay_idempotent(spark, pages_dir, tmp_path):
    """ADVICE scenario: a foreachBatch epoch replayed after a failure between
    the sink write and the checkpoint commit must not duplicate triples —
    the (epoch, part_key) dynamic overwrite rewrites itself."""
    from spanluke_spark.streaming.stream import make_batch_processor

    alias_df = spark.createDataFrame(
        [("spark", 12, "Apache Spark", "ORG", 0.9)],
        "alias string, canonical_id long, canonical_name string, entity_type string, prior double",
    )
    out = str(tmp_path / "replay_kg")
    batch = spark.read.parquet(pages_dir)
    process = make_batch_processor(PIPELINE_GAZETTEER, alias_df, out)

    process(batch, epoch_id=0)
    first = sorted(map(tuple, spark.read.parquet(f"{out}/triples").collect()))
    assert first

    process(batch, epoch_id=0)  # replay the SAME epoch
    second = sorted(map(tuple, spark.read.parquet(f"{out}/triples").collect()))
    assert first == second

    process(batch.limit(40), epoch_id=1)  # a new epoch appends its own rows
    third = spark.read.parquet(f"{out}/triples")
    assert third.filter(F.col("epoch") == 0).count() == len(first)
    assert third.filter(F.col("epoch") == 1).count() > 0


def test_resize_media_dims_and_fake_payload(spark, sf_dir):
    """Aspect-preserving fit, never upscaled; fake resample deterministic
    across partitionings (the codec seam contract)."""
    from spanluke_spark.multimodal.media import resize_media

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    media = synthesize_media(docs)
    r1 = {r.media_id: r for r in resize_media(media).collect()}
    r8 = {r.media_id: r for r in resize_media(media.repartition(8)).collect()}
    assert set(r1) == set(r8)
    for mid, r in r1.items():
        assert r.new_w <= 256 and r.new_h <= 256
        assert r.new_w <= r.width and r.new_h <= r.height  # never upscale
        assert r.new_w >= 1 and r.new_h >= 1
        # aspect ratio preserved within 1px of the exact scale
        scale = min(256 / r.width, 256 / r.height, 1.0)
        assert abs(r.new_w - r.width * scale) < 1 + 1e-9
        assert abs(r.new_h - r.height * scale) < 1 + 1e-9
        assert bytes(r.resized) == bytes(r8[mid].resized)  # worker-stable

    import pytest as _pytest

    with _pytest.raises(Exception, match="codec"):
        resize_media(media, deterministic_fake=False).collect()


def test_stateful_lang_totals_across_microbatches(spark, sf_dir, tmp_path):
    """applyInPandasWithState carries state ACROSS micro-batches: with
    maxFilesPerTrigger=1 each file is its own batch, and the final running
    total per language equals the batch groupBy count."""
    from spanluke_spark.streaming.stream import read_page_stream, stateful_lang_totals

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    path = str(tmp_path / "staged_pages")
    synthesize_pages(docs).repartition(5).write.parquet(path)  # 5 files

    stream = spark.readStream.schema(
        "url string, warc_ts timestamp, html binary, text string, lang string"
    ).option("maxFilesPerTrigger", 1).parquet(path)
    q = (
        stateful_lang_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 5  # state really crossed batch boundaries

    got_rows = spark.table("stateful_totals").collect()
    # running totals are nondecreasing per lang; the max is the final state
    got = {}
    for r in got_rows:
        got[r.lang] = max(got.get(r.lang, 0), r.n_pages)
    want = {
        r.lang: r.n
        for r in synthesize_pages(docs).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    assert got == want
