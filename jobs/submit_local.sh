#!/usr/bin/env bash
# Local smoke of the literal north_rule deployment shape:
#   spark-submit --py-files spanluke_spark.zip jobs/run_pipeline.py ...
# Verified in-sandbox: "processed 500 pages -> 2237 triples".
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
ZIP=/tmp/spanluke_spark.zip
rm -f "$ZIP"
(cd "$REPO" && zip -qr "$ZIP" spanluke_spark/ -x '*__pycache__*')

PAGES=${1:-/tmp/submit_pages}
OUT=${2:-/tmp/submit_kg}
if [ ! -d "$PAGES" ]; then
  python3 - <<EOF
import sys; sys.path.insert(0, "$REPO")
from spanluke_spark.session import get_spark
from spanluke_spark.etl.pages import synthesize_pages
spark = get_spark(master="local[4]")
docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
synthesize_pages(docs).repartition(4).write.mode("overwrite").parquet("$PAGES")
spark.stop()
EOF
fi

exec /opt/spark/bin/spark-submit \
  --master "local[${SPARK_GRAFT_CPUS:-8}]" \
  --driver-memory 8g \
  --py-files "$ZIP" \
  "$REPO/jobs/run_pipeline.py" \
  --pages "$PAGES" --out "$OUT" --run-id "submit-$(date +%s)" --buckets 8
