"""WARC-ingest throughput: the authentic Common-Crawl first mile measured
end-to-end — .warc.gz files (one gzip member per record) -> read_warc ->
extract_text -> count, at local[N].

Standalone like bench/media.py (not part of bench.py's driver line).
Prints one JSON line with pages/sec and MB/sec for the parse-only and the
parse+extract pipelines.

Run: python bench/warc_bench.py [n_files] [pages_per_file] [cpus]
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


def build_files(out_dir: str, n_files: int, pages_per_file: int) -> float:
    """Deterministic .warc.gz fixtures from the sf0.1 documents' texts;
    returns total compressed MB."""
    from spanluke_spark.etl.warc import encode_warc

    import duckdb

    texts = [
        r[0]
        for r in duckdb.sql(
            "select text from read_parquet('/root/testdata/sf0.1/documents.parquet') "
            "order by doc_id limit 500"
        ).fetchall()
    ]
    t0 = datetime(2024, 7, 1, tzinfo=timezone.utc)
    total = 0
    for f in range(n_files):
        recs = []
        for i in range(pages_per_file):
            j = (f * pages_per_file + i) % len(texts)
            html = (
                f"<html><head><script>x=1</script></head><body><h1>Doc {f}:{i}</h1>"
                f"<p>{texts[j]}</p><div>footer</div></body></html>"
            ).encode()
            recs.append(
                (f"https://crawl.example/f{f}/p{i}", t0 + timedelta(seconds=i), html)
            )
        payload = encode_warc(recs, gzip_per_record=True)
        total += len(payload)
        with open(os.path.join(out_dir, f"seg{f:03d}.warc.gz"), "wb") as fh:
            fh.write(payload)
    return total / 1e6


def main() -> None:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    pages_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from spanluke_spark.etl.extract import extract_text
    from spanluke_spark.etl.warc import read_warc
    from spanluke_spark.session import get_spark

    out = tempfile.mkdtemp(prefix="warcbench_")
    try:
        total_mb = build_files(out, n_files, pages_per_file)
        spark = get_spark(
            app_name="warc-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
        )
        n_pages = n_files * pages_per_file

        def parse_only() -> int:
            return read_warc(spark, out, lang="en").count()

        def parse_extract() -> int:
            return extract_text(read_warc(spark, out, lang="en")).filter(
                "text is not null and length(text) > 0"
            ).count()

        results = {}
        for name, fn in (("parse", parse_only), ("parse_extract", parse_extract)):
            fn()  # warm: file listing, workers, codegen
            times = []
            got = 0
            for _ in range(3):
                t0 = time.perf_counter()
                got = fn()
                times.append(time.perf_counter() - t0)
            assert got == n_pages, (name, got, n_pages)
            best = min(times)
            results[name] = {
                "sec": round(best, 2),
                "runs_sec": [round(t, 2) for t in times],
                "pages_per_sec": round(n_pages / best, 1),
                "mb_per_sec": round(total_mb / best, 1),
            }
        print(
            json.dumps(
                {
                    "metric": "warc_ingest_throughput",
                    "n_files": n_files,
                    "n_pages": n_pages,
                    "compressed_mb": round(total_mb, 1),
                    "cpus": cpus,
                    **results,
                }
            )
        )
        spark.stop()
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
