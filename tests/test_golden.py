"""Golden-record survivorship — Python replay parity on random
clusters with planted NULLs, per-attribute independence (different
attrs may survive from different rows), the all-NULL contract, and the
full tie-break chain (priority, then recency, then value)."""

from __future__ import annotations

import random

from spanluke_spark.canon.golden import golden_records

SCHEMA = (
    "cluster: long, priority: long, recency: long, "
    "name: string, country: string"
)


def _py_golden(rows):
    by_c: dict = {}
    for c, p, rec, name, country in rows:
        by_c.setdefault(c, []).append((p, rec, name, country))
    out = {}
    for c, items in by_c.items():
        rec = {"n_records": len(items)}
        for ix, attr in ((2, "name"), (3, "country")):
            vals = [
                (p, -r, row[ix])
                for row in items
                for p, r in [(row[0], row[1])]
                if row[ix] is not None
            ]
            rec[attr] = min(vals)[2] if vals else None
            rec[f"{attr}_n_distinct"] = len(
                {row[ix] for row in items if row[ix] is not None}
            )
        out[c] = rec
    return out


def _spark_golden(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    return {
        r["cluster"]: {k: r[k] for k in r.asDict() if k != "cluster"}
        for r in golden_records(df, ["name", "country"]).collect()
    }


def test_matches_python_replay(spark):
    rng = random.Random(2)
    rows = []
    for _ in range(300):
        rows.append(
            (
                rng.randrange(12),
                rng.randrange(1, 4),
                rng.randrange(10),
                rng.choice([None, "Acme", "ACME Corp", "acme inc"]),
                rng.choice([None, None, "us", "de", "fr"]),
            )
        )
    assert _spark_golden(spark, rows) == _py_golden(rows)


def test_attributes_survive_independently(spark):
    rows = [
        (1, 1, 5, "Best Name", None),       # trusted source, no country
        (1, 3, 9, "Crawl Name", "us"),      # low-trust crawl has country
    ]
    got = _spark_golden(spark, rows)[1]
    assert got["name"] == "Best Name" and got["country"] == "us"


def test_all_null_attribute_stays_null(spark):
    rows = [(2, 1, 1, "n", None), (2, 2, 2, "n", None)]
    got = _spark_golden(spark, rows)[2]
    assert got["country"] is None and got["country_n_distinct"] == 0


def test_tie_break_chain(spark):
    # equal priority -> freshest recency wins; equal both -> min value
    rows = [
        (3, 1, 1, "old", None),
        (3, 1, 9, "fresh", None),
        (4, 1, 5, "b", None),
        (4, 1, 5, "a", None),
    ]
    got = _spark_golden(spark, rows)
    assert got[3]["name"] == "fresh" and got[4]["name"] == "a"
