"""Round-6 auxiliary micro-bench (guide §1.4): per-query noop-sink/count
timing with interleaved min-of-N, independent of the frozen bench.py.

Usage: python bench_extra.py [reps] [query ...]
Env: SPARK_GRAFT_SF_DIR (default sf1.0), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import __spark_entry__ as entrymod
    from spanluke_spark.dedup.dedup import neardup_keep
    from spanluke_spark.fixtures import PIPELINE_GAZETTEER
    from spanluke_spark.pipeline import extract_mentions_span, mentions_to_triples
    from spanluke_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    only = sys.argv[2:]

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]")
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(F.sum(_warm("id"))).collect()

    qs = entrymod.queries()

    def q(name):
        return qs.get(name) or getattr(entrymod, name)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    para = max(int(cpus) // 2, 1)

    plans = {
        name: (lambda n=name: q(n)(spark, sf_dir))
        for name in [
            "q01_pricing_summary",
            "q02_top_revenue_customers",
            "q03_largest_order_per_customer",
            "q04_sessionize_events",
            "q06_strict_eval_set_ops",
            "q07_span_enumeration",
            "q11_token_mentions",
            "q43_repetition",
            "q46_stratified_sample",
            "q47_pack_sequences",
            "q49_lm_score",
        ]
    }
    plans["kg_span_pipeline"] = lambda: mentions_to_triples(
        extract_mentions_span(docs, ["doc_id"], PIPELINE_GAZETTEER, parallelism=para),
        subj_col="doc_id",
    )
    plans["q45_dedup_keep_prod"] = lambda: neardup_keep(docs, verify_threshold=0.05)

    if only:
        plans = {k: v for k, v in plans.items() if k in only}

    for name, fn in plans.items():
        spark.sparkContext.setJobDescription(f"warm {name}")
        fn().count()
    samples: dict[str, list[float]] = {name: [] for name in plans}
    for _ in range(reps):
        for name, fn in plans.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            fn().count()
            samples[name].append(time.perf_counter() - t0)
    out = {
        name: {
            "min": round(min(s), 3),
            "med": round(sorted(s)[len(s) // 2], 3),
            "spread": round(max(s) - min(s), 3),
        }
        for name, s in samples.items()
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
