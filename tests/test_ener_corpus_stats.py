"""E-NER dataset loader (S2) + corpus statistics parity (A3,
legal_ner/utils/count_length.py)."""

import json

import numpy as np
from pyspark.sql import functions as F

ENER_TRAIN = "/root/reference/legal_ner/data/ener/train.jsonl"
ENER_TEST = "/root/reference/legal_ner/data/ener/test.jsonl"
DEV_JSON = "/root/reference/legal_ner/data/NER_DEV/NER_DEV_ALL.json"


def test_ener_loader(spark):
    """Native NDJSON scan of the bundled E-NER split (measured: 9,354/2,339)
    via the package API (etl.ener; reference utils/dataset.py:138-155)."""
    from spanluke_spark.etl.ener import read_ener

    train = read_ener(spark, ENER_TRAIN)
    test = read_ener(spark, ENER_TEST)
    assert train.count() == 9354 and test.count() == 2339
    assert {"tokens", "ner_tags"} <= set(train.columns)
    tags = train.select(F.explode("ner_tags").alias("t")).agg(
        F.min("t").alias("lo"), F.max("t").alias("hi"), F.countDistinct("t").alias("n")
    ).first()
    # 7 E-NER entities -> BIO tags 0..14 (legal_ner/main.py:267-280)
    assert tags.lo == 0 and tags.hi <= 14
    # every record aligns tokens<->tags
    misaligned = train.filter(F.size("tokens") != F.size("ner_tags")).count()
    assert misaligned == 0


def test_ener_token_labels(spark):
    """BIO vocab lookup (main.py:267-280): id 0 -> 'O', ids map into the
    deterministic ["O"] + B-* + I-* list; token rows align positionally."""
    from spanluke_spark.etl.ener import ener_label_list, ener_token_labels, read_ener

    vocab = ener_label_list()
    assert vocab[0] == "O" and len(vocab) == 15
    toks = ener_token_labels(read_ener(spark, ENER_TEST).limit(50))
    rows = toks.collect()
    assert all(r.label == vocab[r.tag_id] for r in rows)
    # positions are dense per row_id starting at 0
    first = toks.groupBy("row_id").agg(
        F.min("pos").alias("lo"), F.max("pos").alias("hi"), F.count("*").alias("n")
    )
    bad = first.filter((F.col("lo") != 0) | (F.col("hi") != F.col("n") - 1)).count()
    assert bad == 0


def test_corpus_stats_match_numpy(spark):
    """A3: entity word-length stats via Spark aggs == numpy (population std,
    ddof=0 — the reference uses np.std, count_length.py:23-24)."""
    data = json.load(open(DEV_JSON))
    lengths = []
    for item in data:
        for r in item["annotations"][0]["result"]:
            lengths.append(len(r["value"]["text"].split()))
    arr = np.array(lengths, dtype=np.float64)

    df = spark.createDataFrame([(int(x),) for x in lengths], "wlen int")
    row = df.agg(
        F.avg("wlen").alias("mean"),
        F.stddev_pop("wlen").alias("std"),
        F.max("wlen").alias("mx"),
        F.min("wlen").alias("mn"),
        F.percentile_approx("wlen", 0.5).alias("med"),
    ).first()
    assert abs(row.mean - arr.mean()) < 1e-9
    assert abs(row.std - arr.std()) < 1e-9  # ddof=0 parity
    assert row.mx == arr.max() and row.mn == arr.min()
    assert abs(row.med - np.median(arr)) <= 1  # approx median within 1 word
