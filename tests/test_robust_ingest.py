"""Fault-tolerant JSONL ingestion: good/quarantine split, no lost lines."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from spanluke_spark.etl.robust import quarantine_count, read_jsonl_robust, split_counts

SCHEMA = "doc_id long, lang string, n long"


def test_robust_split_and_conservation(spark):
    tmp = tempfile.mkdtemp(prefix="robust_")
    try:
        lines = [
            '{"doc_id": 1, "lang": "en", "n": 5}',
            '{"doc_id": 2, "lang": "de"',          # torn
            '{"doc_id": 3, "lang": "fr", "n": 9}',
            "not json at all",
            '{"doc_id": 5, "lang": "en", "n": 1}',
        ]
        with open(os.path.join(tmp, "feed.jsonl"), "w") as f:
            f.write("\n".join(lines) + "\n")
        good, quarantine = read_jsonl_robust(spark, tmp, SCHEMA)
        good_rows = sorted(r["doc_id"] for r in good.collect())
        assert good_rows == [1, 3, 5]
        q = quarantine.select("raw_line", F.coalesce("doc_id", F.lit(0)).alias("d")).collect()
        assert sorted(r["raw_line"] for r in q) == sorted([lines[1], lines[3]])
        # conservation: every input line lands in exactly one side
        n_good, n_bad = split_counts(good, quarantine)
        assert n_good + n_bad == len(lines)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_robust_all_good_has_empty_quarantine(spark):
    tmp = tempfile.mkdtemp(prefix="robust_ok_")
    try:
        with open(os.path.join(tmp, "feed.jsonl"), "w") as f:
            f.write('{"doc_id": 1, "lang": "en", "n": 2}\n')
        good, quarantine = read_jsonl_robust(spark, tmp, SCHEMA)
        n_good, n_bad = split_counts(good, quarantine)
        assert (n_good, n_bad) == (1, 0)
        assert quarantine_count(quarantine) == 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_split_counts_no_overflow_on_many_rows(spark):
    """The keep-alive aggregate sums hashed data values; raw 64-bit hash
    partial sums overflow LongType within a handful of rows and throw under
    ANSI mode — the pmod guard must make counting safe at any row count."""
    tmp = tempfile.mkdtemp(prefix="robust_big_")
    try:
        with open(os.path.join(tmp, "feed.jsonl"), "w") as f:
            for i in range(2000):
                f.write('{"doc_id": %d, "lang": "en", "n": %d}\n' % (i, i * 3))
        good, quarantine = read_jsonl_robust(spark, tmp, SCHEMA)
        assert split_counts(good, quarantine) == (2000, 0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
