"""Streaming latest-wins KG upsert: state across micro-batches,
change-only emission."""

from __future__ import annotations


def _run_upsert(spark, tmp_path, batches):
    """Stage each batch as its own file; maxFilesPerTrigger=1 makes each
    a micro-batch (file order == mtime order, so batch order is the list
    order)."""
    import os
    import time

    from spanluke_spark.streaming.stream import streaming_triple_upsert

    path = str(tmp_path / "obs")
    os.makedirs(path)
    schema = "subj string, pred string, obj string, warc_ts long"
    for i, rows in enumerate(batches):
        sub = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(sub)
        part = next(
            f for f in os.listdir(sub) if f.endswith(".parquet")
        )
        os.rename(os.path.join(sub, part), os.path.join(path, f"b{i}.parquet"))
        # distinct mtimes so the file-source batch order is deterministic
        t = time.time() + i
        os.utime(os.path.join(path, f"b{i}.parquet"), (t, t))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    q = (
        streaming_triple_upsert(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("upsert_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    q.stop()
    rows = spark.table("upsert_t").collect()
    spark.catalog.dropTempView("upsert_t")
    return rows, n_batches


def test_upsert_latest_wins_and_suppression(spark, tmp_path):
    batches = [
        [("s1", "p", "v1", 10), ("s2", "p", "a", 5)],
        [("s1", "p", "v2", 20)],            # newer -> emit changed value
        [("s1", "p", "v2", 20)],            # exact re-observation -> silent
        [("s1", "p", "stale", 15)],         # older -> silent, state keeps v2
        [("s2", "p", "b", 5)],              # ts tie, obj 'b' > 'a' -> emit
    ]
    rows, n_batches = _run_upsert(spark, tmp_path, batches)
    assert n_batches == 5  # state really crossed batch boundaries
    emitted = [(r["subj"], r["obj"], r["warc_ts"]) for r in rows]
    # s1: initial v1 then v2; stale and duplicate suppressed. s2: a then b.
    assert sorted(emitted) == [
        ("s1", "v1", 10), ("s1", "v2", 20), ("s2", "a", 5), ("s2", "b", 5)
    ]


def test_upsert_batch_order_insensitive_final_state(spark, tmp_path):
    import itertools

    obs = [("s", "p", "o%d" % i, i) for i in range(4)]
    finals = set()
    for j, perm in enumerate(itertools.permutations(obs)):
        if j >= 3:  # three contrasting orders are enough
            break
        sub = tmp_path / f"perm{j}"
        sub.mkdir()
        rows, _ = _run_upsert(spark, sub, [[r] for r in perm])
        best = max((r["warc_ts"], r["obj"]) for r in rows)
        finals.add(best)
    assert finals == {(3, "o3")}  # same final fact regardless of arrival order
