"""Composed end-to-end rehearsal (VERDICT r5 #1): ONE pipeline over the
scale-factor corpus — WARC ingest -> HTML extract -> curate (quality +
decontaminate + two-tier dedup incl. CC) -> NER span mentions -> alias
link -> triples with lineage -> mid-run kill/resume — with per-stage
wall-times in one BENCH-style JSON line.

The pieces are each proven by the unit/oracle suites; this measures the
COMPOSITION at the largest local scale. Standalone like bench/media.py
(not part of bench.py's frozen driver line).

Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench/e2e_rehearsal.py [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from datetime import datetime, timedelta, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_warc_corpus(out_dir: str, sf_dir: str, pages_per_file: int = 500) -> dict:
    """Every document of the SF as one WARC record (same html template the
    pipeline's synthesize_pages uses), gzip-per-record .warc.gz files."""
    import duckdb

    from spanluke_spark.etl.warc import encode_warc

    rows = duckdb.sql(
        f"select doc_id, text from read_parquet('{sf_dir}/documents.parquet') order by doc_id"
    ).fetchall()
    t0 = datetime(2024, 7, 1, tzinfo=timezone.utc)
    total = 0
    n_files = 0
    for off in range(0, len(rows), pages_per_file):
        recs = []
        for doc_id, text in rows[off : off + pages_per_file]:
            html = (
                "<html><head><title>t</title><style>body{color:red}</style>"
                f"<script>var x=1;</script></head><body><h1>Document {doc_id}"
                f"</h1><p>{text}</p><footer>crawl footer</footer></body></html>"
            ).encode()
            recs.append(
                (
                    f"https://example.org/doc/{doc_id}",
                    t0 + timedelta(seconds=int(doc_id)),
                    html,
                )
            )
        payload = encode_warc(recs, gzip_per_record=True)
        total += len(payload)
        with open(os.path.join(out_dir, f"seg{n_files:04d}.warc.gz"), "wb") as fh:
            fh.write(payload)
        n_files += 1
    return {"n_pages": len(rows), "n_files": n_files, "mb": round(total / 1e6, 1)}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from pyspark.sql import functions as F

    from spanluke_spark.etl.extract import extract_text
    from spanluke_spark.etl.warc import read_warc
    from spanluke_spark.fixtures import PIPELINE_GAZETTEER
    from spanluke_spark.kg import read_triples, run_kg_pipeline
    from spanluke_spark.session import get_spark
    from spanluke_spark.storage.lineage import read_lineage, with_part_key
    from spanluke_spark.textops.curate import curate

    spark = get_spark(app_name="e2e_rehearsal", master=f"local[{cpus}]")
    work = tempfile.mkdtemp(prefix="e2e_r6_")
    warc_dir = os.path.join(work, "warc")
    os.makedirs(warc_dir)
    para = max(int(cpus) // 2, 1)

    t0 = time.perf_counter()
    setup = build_warc_corpus(warc_dir, sf_dir)
    setup["sec"] = round(time.perf_counter() - t0, 3)

    stages: dict[str, float] = {}

    def timed(name, fn):
        best = None
        out = None
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"e2e:{name}")
            t = time.perf_counter()
            out = fn()
            dt = time.perf_counter() - t
            best = dt if best is None else min(best, dt)
        stages[name] = round(best, 3)
        return out

    # 1. WARC ingest (parse + HTTP strip, one file per task, no shuffle)
    n_ingested = timed("warc_ingest", lambda: read_warc(spark, warc_dir, lang="en").count())

    # 2. + HTML -> text extraction
    pages = read_warc(spark, warc_dir, lang="en")
    n_extracted = timed(
        "extract", lambda: extract_text(pages).filter(F.col("text").isNotNull()).count()
    )

    # 3. curate: quality gate + benchmark decontamination + two-tier dedup
    # (exact collapse -> MinHash-LSH -> connected components -> survivors)
    docs = extract_text(pages).select(
        F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("doc_id"),
        "text",
        "lang",
    )
    bench_mark = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).where(
        "doc_id % 997 = 0"
    ).select("text")
    n_curated = timed(
        "curate",
        lambda: curate(
            docs, min_tokens=5, dedup_threshold=0.05, benchmark=bench_mark
        ).count(),
    )

    # 4. full KG pass: fused html->text->span mentions -> alias link ->
    # triples, bucketed dynamic-partition write + lineage
    alias_df = spark.createDataFrame(
        [
            ("hash join", 10, "Hash Join", "COURT", 0.9),
            ("table scan", 11, "Table Scan", "STATUTE", 0.9),
            ("spark", 12, "Apache Spark", "ORG", 0.9),
        ],
        "alias string, canonical_id long, canonical_name string, entity_type string, prior double",
    )
    kg_out = os.path.join(work, "kg_full")
    spark.sparkContext.setJobDescription("e2e:kg_full")
    t = time.perf_counter()
    r_full = run_kg_pipeline(
        spark, pages, PIPELINE_GAZETTEER, alias_df, kg_out, run_id="full",
        n_buckets=16, parallelism=para,
    )
    stages["kg_full"] = round(time.perf_counter() - t, 3)

    # 5. kill/resume: first run sees only half the partitions (the
    # committed simulation of a mid-run kill: lineage rows exist for the
    # finished buckets only), then the resume processes the rest; the
    # accumulated triples must contain ZERO duplicates and every partition
    # exactly one lineage row.
    res_out = os.path.join(work, "kg_resume")
    keyed = with_part_key(pages, "url", 16)
    partial = keyed.filter(F.col("part_key") < 8).drop("part_key")
    spark.sparkContext.setJobDescription("e2e:kill (partial run)")
    t = time.perf_counter()
    r1 = run_kg_pipeline(
        spark, partial, PIPELINE_GAZETTEER, alias_df, res_out, run_id="r1",
        n_buckets=16, parallelism=para,
    )
    stages["kg_until_kill"] = round(time.perf_counter() - t, 3)
    spark.sparkContext.setJobDescription("e2e:resume")
    t = time.perf_counter()
    r2 = run_kg_pipeline(
        spark, pages, PIPELINE_GAZETTEER, alias_df, res_out, run_id="r2",
        n_buckets=16, parallelism=para,
    )
    stages["kg_resume"] = round(time.perf_counter() - t, 3)

    t_res = read_triples(spark, res_out)
    n_triples_res = t_res.count()
    n_dupes = n_triples_res - t_res.dropDuplicates(["subj", "pred", "obj", "url"]).count()
    lin = read_lineage(spark, os.path.join(res_out, "lineage"))
    parts_multi = (
        lin.groupBy("part_key").count().filter(F.col("count") != 1).count()
    )
    t_full = read_triples(spark, kg_out)
    resume_identical = (
        t_full.count() == n_triples_res
        and t_full.exceptAll(t_res.select(*t_full.columns)).count() == 0
    )

    print(
        json.dumps(
            {
                "metric": "e2e_rehearsal_total",
                "value": round(sum(stages.values()), 3),
                "unit": "sec",
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": int(cpus),
                "reps": reps,
                "setup": setup,
                "stages": stages,
                "n_ingested": n_ingested,
                "n_extracted": n_extracted,
                "n_curated": n_curated,
                "kg": {
                    "n_pages": r_full["n_pages"],
                    "n_triples": r_full["n_triples"],
                    "n_mentions": r_full.get("n_mentions"),
                },
                "resume": {
                    "pages_before_kill": r1["n_pages"],
                    "pages_after_resume": r2["n_pages"],
                    "duplicate_triples": n_dupes,
                    "partitions_with_multiple_lineage_rows": parts_multi,
                    "identical_to_uninterrupted_run": bool(resume_identical),
                },
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
