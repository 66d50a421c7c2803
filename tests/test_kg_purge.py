"""Purge/retraction gates (kg.purge_urls): facts for purged urls are
gone, surviving facts are byte-identical, UNTOUCHED partition files are
physically untouched (partition-pruned rewrite), fully-purged partitions
disappear from disk, the lineage trail records the post-purge state, and
a pipeline rerun stays a no-op (purged urls are not re-extracted).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from spanluke_spark.kg import (
    purge_urls,
    read_legal_facts,
    run_legal_facts_pipeline,
)

_TEXT = (
    "IN THE SUPREME COURT OF INDIA. Criminal Appeal No. {n} of 2001. "
    "the appeal is allowed."
)


def _pages(spark, n):
    rows = [
        (f"https://court.example/case/{i}", _TEXT.format(n=i + 1), b"")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "url string, text string, html binary")


def _files(facts_path):
    out = {}
    for root, _, names in os.walk(facts_path):
        for f in names:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[p] = os.path.getmtime(p)
    return out


def test_purge_is_partition_pruned_and_lineage_corrected(spark, tmp_path):
    out = str(tmp_path / "kg")
    pages = _pages(spark, 12)
    stats = run_legal_facts_pipeline(spark, pages, out, run_id="r1", n_buckets=4)
    assert stats["n_pages"] == 12

    facts_path = os.path.join(out, "facts")
    before = read_legal_facts(spark, out)
    keep_rows = sorted(
        map(tuple, before.where(~before.url.isin(
            "https://court.example/case/3")).collect())
    )
    files_before = _files(facts_path)

    res = purge_urls(
        spark, out, ["https://court.example/case/3"], n_buckets=4,
        run_id="purge1",
    )
    assert res["n_purged"] > 0
    assert res["parts_rewritten"] + res["parts_deleted"] == 1  # one url -> one partition

    after = read_legal_facts(spark, out)
    assert after.where(after.url == "https://court.example/case/3").count() == 0
    assert sorted(map(tuple, after.collect())) == keep_rows

    # untouched partitions: identical files, identical mtimes
    touched_dir = None
    for p, mt in files_before.items():
        part = p.split("part_key=")[1].split("/")[0]
        if p in _files(facts_path) and _files(facts_path)[p] == mt:
            continue
        touched_dir = part
    files_after = _files(facts_path)
    untouched = [p for p in files_before if p in files_after
                 and files_after[p] == files_before[p]]
    assert len(untouched) >= len(files_before) - 2  # only the hit partition moved
    assert touched_dir is not None

    # lineage carries a purge row whose checksum matches the live data
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    prow = lineage.where(lineage.run_id == "purge1").collect()
    assert len(prow) == 1
    pk = prow[0]["part_key"]
    live = after.where(F.col("part_key") == pk)
    want = live.agg(
        F.sum(F.pmod(F.xxhash64("subj", "pred", "obj"), F.lit(2147483647)))
    ).collect()[0][0]
    assert prow[0]["n_triples"] == live.count()
    assert prow[0]["checksum"] == (want or 0)

    # rerun: still a complete store, nothing re-extracted
    stats2 = run_legal_facts_pipeline(spark, pages, out, run_id="r2", n_buckets=4)
    assert stats2 == {"n_pages": 0, "n_facts": 0}
    assert read_legal_facts(spark, out).where(
        F.col("url") == "https://court.example/case/3").count() == 0


def test_purge_whole_partition_deletes_directory(spark, tmp_path):
    out = str(tmp_path / "kg")
    # n_buckets=64 with 3 urls: very likely each url is alone in its
    # partition; assert against the ACTUAL partition membership instead
    pages = _pages(spark, 3)
    run_legal_facts_pipeline(spark, pages, out, run_id="r1", n_buckets=64)
    facts = read_legal_facts(spark, out)
    url0 = "https://court.example/case/0"
    pk0 = facts.where(facts.url == url0).select("part_key").first()[0]
    mates = facts.where(
        (F.col("part_key") == pk0) & (facts.url != url0)
    ).count()
    res = purge_urls(spark, out, [url0], n_buckets=64, run_id="p")
    assert res["n_purged"] > 0
    part_dir = os.path.join(out, "facts", f"part_key={pk0}")
    if mates == 0:
        assert res["parts_deleted"] == 1
        assert not os.path.exists(part_dir)
    else:
        assert res["parts_rewritten"] == 1
    # store still reads cleanly and url0 is gone
    left = read_legal_facts(spark, out)
    assert left.where(left.url == url0).count() == 0
    assert left.count() > 0


def test_purge_absent_urls_is_noop(spark, tmp_path):
    out = str(tmp_path / "kg")
    run_legal_facts_pipeline(spark, _pages(spark, 4), out, run_id="r1",
                             n_buckets=4)
    before = sorted(map(tuple, read_legal_facts(spark, out).collect()))
    res = purge_urls(spark, out, ["https://nowhere/x"], n_buckets=4)
    assert res == {"n_purged": 0, "parts_rewritten": 0, "parts_deleted": 0}
    assert sorted(map(tuple, read_legal_facts(spark, out).collect())) == before


def test_purge_span_triples_store(spark, tmp_path):
    from spanluke_spark.fixtures import PIPELINE_GAZETTEER
    from spanluke_spark.kg import read_triples, run_kg_pipeline

    out = str(tmp_path / "kg")
    rows = [
        (f"https://court.example/case/{i}",
         b"<html><body><p>the hash join beat the table scan "
         b"inside spark again</p></body></html>")
        for i in range(6)
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    alias_df = spark.createDataFrame(
        [("hash join", 10, "Hash Join", "COURT", 0.9),
         ("spark", 12, "Apache Spark", "ORG", 0.9)],
        "alias string, canonical_id long, canonical_name string, "
        "entity_type string, prior double",
    )
    run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out,
                    run_id="r1", n_buckets=4)

    url0 = "https://court.example/case/2"
    before = read_triples(spark, out)
    assert before.where(before.url == url0).count() > 0
    keep = sorted(map(tuple, before.where(before.url != url0).collect()))

    res = purge_urls(spark, out, [url0], n_buckets=4, run_id="p1",
                     table="triples")
    assert res["n_purged"] > 0
    after = read_triples(spark, out)
    assert after.where(after.url == url0).count() == 0
    assert sorted(map(tuple, after.collect())) == keep
    # corrective lineage row uses the span-store mention identity
    lineage = spark.read.parquet(os.path.join(out, "lineage"))
    prow = lineage.where(lineage.run_id == "p1").collect()
    assert len(prow) == 1 and prow[0]["n_triples"] == after.where(
        F.col("part_key") == prow[0]["part_key"]).count()
