"""spark-submit entry point for the KG pipeline (north_rule deployment shape).

Cluster:
    zip -r spanluke_spark.zip spanluke_spark/
    spark-submit --py-files spanluke_spark.zip jobs/run_pipeline.py \
        --pages cat.db.pages --out s3://bucket/kg --run-id r1 \
        --langs en --buckets 4096

Local smoke:
    python jobs/run_pipeline.py --pages /tmp/pages_parquet --out /tmp/kg_out
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages table ref (catalog or parquet path)")
    ap.add_argument("--out", required=True, help="output dir/prefix for triples + lineage")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--langs", nargs="*", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--alias-dict", default=None, help="parquet path of the alias dictionary")
    ap.add_argument("--parallelism", type=int, default=None)
    args = ap.parse_args()

    from spanluke_spark.fixtures import PIPELINE_GAZETTEER
    from spanluke_spark.kg import run_kg_pipeline
    from spanluke_spark.session import get_spark
    from spanluke_spark.storage.tables import prune_scan, read_table

    spark = get_spark(app_name="spanluke-kg")
    pages = prune_scan(read_table(spark, args.pages), langs=args.langs)
    if args.alias_dict:
        alias_df = read_table(spark, args.alias_dict)
    else:
        alias_df = spark.createDataFrame(
            [("hash join", 10, "Hash Join", "COURT", 0.9), ("spark", 12, "Apache Spark", "ORG", 0.9)],
            "alias string, canonical_id long, canonical_name string, entity_type string, prior double",
        )
    stats = run_kg_pipeline(
        spark,
        pages,
        PIPELINE_GAZETTEER,
        alias_df,
        args.out,
        run_id=args.run_id,
        n_buckets=args.buckets,
        parallelism=args.parallelism,
    )
    print(f"processed {stats['n_pages']} pages -> {stats['n_triples']} triples")
    spark.stop()


if __name__ == "__main__":
    main()
