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

    def q(name):
        # q01-q03 were retired from the 50-entry driver registry but stay
        # benched: resolve them as module attributes.
        return qs.get(name) or getattr(entrymod, name)

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
        q(name)(spark, sf_dir).count()
    kg_pipeline().count()

    # INTERLEAVED min-of-4 (bench/scaling.py discipline): each rep cycles
    # through every query before the next rep starts, so slow hypervisor
    # drift hits all queries equally instead of biasing whichever query ran
    # while the host was loaded. min = noise-robust point estimate for a
    # deterministic workload; spread (max-min over reps) is reported so a
    # drifting host is visible in the number itself.
    REPS = 4
    samples: dict[str, list[float]] = {name: [] for name in headline}
    samples["kg_span_pipeline"] = []
    n_triples = 0
    for _ in range(REPS):
        for name in headline:
            t0 = time.perf_counter()
            n = q(name)(spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
            assert n >= 0
        t0 = time.perf_counter()
        n_triples = kg_pipeline().count()
        samples["kg_span_pipeline"].append(time.perf_counter() - t0)

    timings = {name: round(min(s), 3) for name, s in samples.items()}
    spread = {name: round(max(s) - min(s), 3) for name, s in samples.items()}
    kg_sec = min(samples["kg_span_pipeline"])

    total = round(sum(timings.values()), 3)

    # Curation-op family (training-data pipeline): timed separately so the
    # headline total stays comparable across rounds. min-of-2 (they're cheap).
    from spanluke_spark.dedup.dedup import neardup_keep

    def dedup_keep_production(spark, sf_dir):
        # q45's operator on the PRODUCTION path: xxhash64 (not the
        # md5-portable oracle mode) + exact-collapse-before-LSH two-tier
        # survivor selection (r5) — identical output, O(c) identical-cluster
        # candidates
        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return neardup_keep(d, verify_threshold=0.05)

    curation = [
        ("q43_repetition", qs["q43_repetition"]),
        ("q45_dedup_keep_prod", dedup_keep_production),
        ("q46_stratified_sample", qs["q46_stratified_sample"]),
        ("q47_pack_sequences", qs["q47_pack_sequences"]),
        ("q49_lm_score", qs["q49_lm_score"]),
    ]
    for _, fn in curation:
        fn(spark, sf_dir).count()  # warm
    cur_samples: dict[str, list[float]] = {name: [] for name, _ in curation}
    for _ in range(3):  # interleaved, same discipline as headline
        for name, fn in curation:
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            cur_samples[name].append(time.perf_counter() - t0)
    curation_timings = {n: round(min(s), 3) for n, s in cur_samples.items()}

    # Legal-facts lanes (single-scan formulation): pages/sec through all
    # twelve codegen extraction lanes over the synthesized page corpus
    from spanluke_spark.etl.legalfacts import legal_facts_onepass

    # repartition to core width: the sf0.1 parquet has few splits, and
    # scan-side lanes parallelize with input splits (as a 100 TB table does)
    lf_pages = entrymod._q190_synth(spark, sf_dir).repartition(int(cpus)).cache()
    n_lf_pages = lf_pages.count()
    legal_facts_onepass(lf_pages).count()  # warm
    lf_secs = []
    for _ in range(3):
        t0 = time.perf_counter()
        legal_facts_onepass(lf_pages).count()
        lf_secs.append(time.perf_counter() - t0)
    lf_sec = min(lf_secs)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "reps": REPS,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "n_triples": n_triples,
                "docs_per_sec": round(n_docs / kg_sec, 1),
                "cpus": int(cpus),
                "curation_queries": curation_timings,
                "curation_total": round(sum(curation_timings.values()), 3),
                "legalfacts_sec": round(lf_sec, 3),
                "legalfacts_pages_per_sec": round(n_lf_pages / lf_sec, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
