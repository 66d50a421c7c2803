"""Full KG pipeline + kill/resume idempotence (SURVEY §5.2.5, north_rule)."""

import pytest
from pyspark.sql import functions as F

from spanluke_spark.etl.pages import synthesize_pages
from spanluke_spark.fixtures import PIPELINE_GAZETTEER
from spanluke_spark.kg import read_triples, run_kg_pipeline
from spanluke_spark.storage.lineage import read_lineage, with_part_key


@pytest.fixture()
def alias_df(spark):
    return spark.createDataFrame(
        [
            ("hash join", 10, "Hash Join", "COURT", 0.9),
            ("table scan", 11, "Table Scan", "STATUTE", 0.9),
            ("spark", 12, "Apache Spark", "ORG", 0.9),
        ],
        "alias string, canonical_id long, canonical_name string, entity_type string, prior double",
    )


def test_kg_pipeline_and_resume(spark, sf_dir, alias_df, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)
    pages = synthesize_pages(docs)
    out = str(tmp_path / "kg")

    # --- simulated crash: first run only sees partitions 0..7 of 16
    keyed = with_part_key(pages, "url", 16)
    partial_pages = keyed.filter(F.col("part_key") < 8).drop("part_key")
    r1 = run_kg_pipeline(spark, partial_pages, PIPELINE_GAZETTEER, alias_df, out, run_id="r1")
    assert r1["n_pages"] > 0
    lin1 = read_lineage(spark, f"{out}/lineage")
    done1 = {r.part_key for r in lin1.select("part_key").distinct().collect()}
    assert done1 and all(k < 8 for k in done1)
    t1 = read_triples(spark, out)
    n1 = t1.count()

    # --- resume over the FULL page set: only pending partitions process
    r2 = run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="r2")
    lin2 = read_lineage(spark, f"{out}/lineage")
    # every partition completed exactly once across both runs
    per_part = lin2.groupBy("part_key").count().collect()
    assert all(r["count"] == 1 for r in per_part)
    assert r2["n_pages"] + r1["n_pages"] == pages.count()

    t2 = read_triples(spark, out)
    # no duplicate triples from the resume (idempotence)
    assert t2.count() == t2.dropDuplicates(["subj", "pred", "obj", "url"]).count()
    assert t2.count() > n1

    # --- third run: nothing pending, nothing appended
    r3 = run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="r3")
    assert r3["n_pages"] == 0 and r3["n_triples"] == 0
    assert read_triples(spark, out).count() == t2.count()

    # triples reference real canonical entities for linked labels
    ent_subjs = {r.subj for r in t2.filter(F.col("subj").startswith("ent:")).collect()}
    assert "ent:12" in ent_subjs  # spark -> Apache Spark


def test_lineage_checksum_stable(spark, sf_dir, alias_df, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    pages = synthesize_pages(docs)
    outs = []
    for i, shuffle_parts in enumerate((4, 24)):
        out = str(tmp_path / f"kg{i}")
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_parts))
        try:
            run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="x")
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
        lin = read_lineage(spark, f"{out}/lineage")
        outs.append(
            {r.part_key: (r.n_pages, r.n_mentions, r.n_triples, r.checksum) for r in lin.collect()}
        )
    # lineage (incl. content checksums) identical regardless of parallelism
    assert outs[0] == outs[1]


def test_crash_between_triples_and_lineage_no_duplicates(
    spark, sf_dir, alias_df, tmp_path
):
    """ADVICE scenario: a crash AFTER the triples write but BEFORE the
    lineage write must not duplicate triples on rerun — the dynamic
    partition overwrite rewrites the same part_key directories."""
    import shutil

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    pages = synthesize_pages(docs)
    out = str(tmp_path / "kg")

    run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="r1")
    t1 = read_triples(spark, out)
    rows1 = sorted(map(tuple, t1.collect()))

    # simulate the torn commit: triples landed, lineage did not
    shutil.rmtree(f"{out}/lineage")

    run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="r2")
    t2 = read_triples(spark, out)
    rows2 = sorted(map(tuple, t2.collect()))
    assert rows1 == rows2  # byte-identical table, zero duplicates


def test_recanonicalize_compaction(spark, sf_dir, alias_df, tmp_path):
    """Incremental runs canonicalize against the key space known at write
    time; the compaction pass converges the accumulated table to what a
    single global canonicalization would produce."""
    from pyspark.sql import functions as F  # noqa: F811

    from spanluke_spark.canon.canonicalize import (
        apply_canonicalization,
        canonicalize_entities,
    )
    from spanluke_spark.kg import recanonicalize

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(150)
    pages = synthesize_pages(docs)
    out = str(tmp_path / "kg")

    keyed = with_part_key(pages, "url", 16)
    first = keyed.filter(F.col("part_key") < 8).drop("part_key")
    run_kg_pipeline(
        spark, first, PIPELINE_GAZETTEER, alias_df, out, run_id="a", canonicalize=True
    )
    run_kg_pipeline(
        spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="b", canonicalize=True
    )

    n = recanonicalize(spark, out)
    got = read_triples(spark, out)
    assert got.count() == n

    # global oracle: canonicalize the compacted table once more -> fixpoint
    mapping = canonicalize_entities(got)
    again = apply_canonicalization(got, mapping)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, again.collect()))


def test_pipeline_has_zero_persists_and_bounded_jobs(spark, sf_dir, alias_df, tmp_path):
    """r3 action item 5: the delta materializes to storage exactly once —
    no persist() anywhere in run_kg_pipeline, and a full run costs a small
    constant number of Spark jobs (anti-join count, extraction+write,
    lineage read-back, lineage append — not one job per mention table or a
    recompute of the extraction for metrics)."""
    import inspect

    from spanluke_spark.kg import run_kg_pipeline as fn

    src = inspect.getsource(fn)
    assert ".persist(" not in src and ".cache(" not in src

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(120)
    pages = synthesize_pages(docs)
    out = str(tmp_path / "kg")

    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    r = run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="j1")
    after = set(tracker.getJobIdsForGroup(None))
    n_jobs = len(after - before)
    assert r["n_pages"] > 0 and r["n_mentions"] >= r["n_pages"] == 120
    # constant bound: AQE splits each query into a few jobs, but the total
    # never scales with data volume (no per-row/per-partition driver loops,
    # no extraction recompute for metrics)
    assert 0 < n_jobs <= 20, n_jobs

    # resumed no-op run: one anti-join scan only
    before = set(tracker.getJobIdsForGroup(None))
    r2 = run_kg_pipeline(spark, pages, PIPELINE_GAZETTEER, alias_df, out, run_id="j2")
    after = set(tracker.getJobIdsForGroup(None))
    assert r2 == {"n_pages": 0, "n_triples": 0, "n_mentions": 0}
    assert len(after - before) <= 6, len(after - before)
