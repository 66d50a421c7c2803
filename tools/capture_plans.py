"""Capture .explain("formatted") for the bench queries into plans/r06/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: "before" or "after" (file name suffix)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entrymod
    from spanluke_spark.dedup.dedup import neardup_keep
    from spanluke_spark.fixtures import PIPELINE_GAZETTEER
    from spanluke_spark.pipeline import extract_mentions_span, mentions_to_triples
    from spanluke_spark.session import get_spark

    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name="capture_plans", master=f"local[{cpus}]")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06")
    os.makedirs(out_dir, exist_ok=True)

    qs = entrymod.queries()

    def q(name):
        return qs.get(name) or getattr(entrymod, name)

    names = [
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
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    special = {
        "kg_span_pipeline": lambda: mentions_to_triples(
            extract_mentions_span(
                docs, ["doc_id"], PIPELINE_GAZETTEER, parallelism=max(int(cpus) // 2, 1)
            ),
            subj_col="doc_id",
        ),
        "q45_dedup_keep_prod": lambda: neardup_keep(docs, verify_threshold=0.05),
    }

    for name in names:
        if only and name not in only:
            continue
        df = q(name)(spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        print("wrote", path)
    for name, fn in special.items():
        if only and name not in only:
            continue
        df = fn()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
