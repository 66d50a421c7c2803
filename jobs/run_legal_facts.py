"""spark-submit entry point for the legal-facts lanes (north_rule
deployment shape, same packaging as jobs/run_pipeline.py).

Cluster:
    zip -r spanluke_spark.zip spanluke_spark/
    spark-submit --py-files spanluke_spark.zip jobs/run_legal_facts.py \
        --pages cat.db.pages --out s3://bucket/legal_kg --run-id r1 \
        --langs en --buckets 4096

Local smoke:
    python jobs/run_legal_facts.py --pages /tmp/pages_parquet --out /tmp/lf_out

Input pages need (url, text); pass --from-html to run the deterministic
HTML extractor first (pages with (url, html) instead).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True, help="pages table ref (catalog or parquet path)")
    ap.add_argument("--out", required=True, help="output dir/prefix for facts + lineage")
    ap.add_argument("--run-id", default="run0")
    ap.add_argument("--langs", nargs="*", default=None)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--from-html", action="store_true", help="extract text from the html column first")
    args = ap.parse_args()

    from spanluke_spark.kg import run_legal_facts_pipeline
    from spanluke_spark.session import get_spark
    from spanluke_spark.storage.tables import prune_scan, read_table

    spark = get_spark(app_name="spanluke-legal-facts")
    pages = prune_scan(read_table(spark, args.pages), langs=args.langs)
    if args.from_html:
        from spanluke_spark.etl.extract import extract_text

        pages = extract_text(pages)
    stats = run_legal_facts_pipeline(
        spark, pages, args.out, run_id=args.run_id, n_buckets=args.buckets
    )
    print(f"processed {stats['n_pages']} pages -> {stats['n_facts']} facts")
    spark.stop()


if __name__ == "__main__":
    main()
