"""Resumable legal-facts materialization (kg.py::run_legal_facts_pipeline)."""

from __future__ import annotations

from spanluke_spark.kg import read_legal_facts, run_legal_facts_pipeline

_DOC = (
    "CORAM: HON'BLE MR. JUSTICE D.Y. CHANDRACHUD. "
    "he was convicted u/s 302/34 IPC. "
    "the matter of State of Punjab v. Baldev Singh was heard. "
    '"we allow the appeal," said Kevin Rao. '
    "order dated 25.03.2004."
)


def _pages(spark, urls):
    return spark.createDataFrame(
        [(u, _DOC) for u in urls], "url string, text string"
    )


def test_run_resume_and_delta(spark, tmp_path):
    out = str(tmp_path / "legal_kg")
    urls = [f"https://host/case/{i}" for i in range(10)]

    r1 = run_legal_facts_pipeline(spark, _pages(spark, urls), out, run_id="r1")
    assert r1["n_pages"] == 10
    assert r1["n_facts"] == 10 * 6  # six facts per synthetic judgment

    facts = read_legal_facts(spark, out)
    got = {
        (r.pred, r.obj)
        for r in facts.where(facts.url == urls[0]).collect()
    }
    assert ("charged_under", "IPC s.302") in got
    assert ("heard_by", "d y chandrachud") in got
    assert ("dated", "2004-03-25") in got

    # identical rerun: every partition has a lineage row -> empty delta
    r2 = run_legal_facts_pipeline(spark, _pages(spark, urls), out, run_id="r2")
    assert r2 == {"n_pages": 0, "n_facts": 0}

    # crash-resume semantics are PARTITION-granular: a page whose bucket
    # already has a lineage row is skipped; one in a pending bucket runs.
    # Probe for a url hashing into a bucket the first run did not touch.
    import pyspark.sql.functions as F

    from spanluke_spark.storage.lineage import with_part_key

    done = {
        r.part_key
        for r in spark.read.parquet(out + "/lineage").select("part_key").collect()
    }
    cands = [f"https://host/probe/{i}" for i in range(64)]
    keyed = with_part_key(
        spark.createDataFrame([(u,) for u in cands], "url string"), "url", 16
    ).collect()
    fresh = next(r.url for r in keyed if r.part_key not in done)
    stale_bucket = next(r.url for r in keyed if r.part_key in done)

    r3 = run_legal_facts_pipeline(
        spark, _pages(spark, urls + [fresh, stale_bucket]), out, run_id="r3"
    )
    assert r3["n_pages"] == 1  # only the fresh-bucket page is pending
    facts = read_legal_facts(spark, out)
    assert facts.where(facts.url == fresh).count() == 6
    assert facts.where(F.col("url") == stale_bucket).count() == 0
    assert facts.count() == 11 * 6
