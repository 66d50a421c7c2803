"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the flagship KG pipeline (span + token extraction -> triples)
plus the shuffle-heavy relational operators (agg, join, window, sessionize).
"""

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    import __spark_entry__ as entrymod
    from spanluke_spark.fixtures import PIPELINE_GAZETTEER
    from spanluke_spark.pipeline import extract_mentions_span, mentions_to_triples
    from spanluke_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{cpus}]")
    # Warm the JVM + Python workers once so timings measure the plans, not startup.
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(F.sum(_warm("id"))).collect()

    qs = entrymod.queries()
    headline = [
        "q01_pricing_summary",
        "q02_top_revenue_customers",
        "q03_largest_order_per_customer",
        "q04_sessionize_events",
        "q06_strict_eval_set_ops",
        "q07_span_enumeration",
        "q11_token_mentions",
    ]

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    # Python-kernel stages: tasks = cores/2 locally — measured optimum; at
    # task-count == cores the Arrow worker pool contends with JVM task threads.
    para = max(int(cpus) // 2, 1)

    def kg_pipeline():
        return mentions_to_triples(
            extract_mentions_span(docs, ["doc_id"], PIPELINE_GAZETTEER, parallelism=para),
            subj_col="doc_id",
        )

    # Warm-up pass: spawn Python workers, JIT/codegen, parquet footers — the
    # driver measures engine steady state, not JVM cold start.
    for name in headline:
        qs[name](spark, sf_dir).count()
    kg_pipeline().count()

    # min-of-3 per query: damps hypervisor load noise (the sandbox host is
    # oversubscribed — BASELINE.md "hardware_ceiling"); min is the standard
    # noise-robust point estimate for a deterministic workload.
    REPS = 3
    timings: dict[str, float] = {}
    for name in headline:
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            n = qs[name](spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
            assert n >= 0
        timings[name] = round(best, 3)

    # Flagship KG pipeline at this SF: documents -> span mentions -> triples.
    kg_sec = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        n_triples = kg_pipeline().count()
        kg_sec = min(kg_sec, time.perf_counter() - t0)
    timings["kg_span_pipeline"] = round(kg_sec, 3)

    total = round(sum(timings.values()), 3)

    # Curation-op family (training-data pipeline): timed separately so the
    # headline total stays comparable across rounds. min-of-2 (they're cheap).
    from spanluke_spark.dedup.dedup import dedup_keep, minhash_lsh_pairs

    def dedup_keep_production(spark, sf_dir):
        # q45's operator on the PRODUCTION hash path (xxhash64, not the
        # md5-portable mode the DuckDB oracle needs)
        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return dedup_keep(d, minhash_lsh_pairs(d, verify_threshold=0.05))

    curation = [
        ("q43_repetition", qs["q43_repetition"]),
        ("q45_dedup_keep_prod", dedup_keep_production),
        ("q46_stratified_sample", qs["q46_stratified_sample"]),
        ("q47_pack_sequences", qs["q47_pack_sequences"]),
        ("q49_lm_score", qs["q49_lm_score"]),
    ]
    curation_timings: dict[str, float] = {}
    for name, fn in curation:
        fn(spark, sf_dir).count()  # warm
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        curation_timings[name] = round(best, 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_triples": n_triples,
                "docs_per_sec": round(n_docs / kg_sec, 1),
                "cpus": int(cpus),
                "curation_queries": curation_timings,
                "curation_total": round(sum(curation_timings.values()), 3),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
