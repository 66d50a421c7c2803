"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at sf0.01 (or $SF_DIR) and compares
against oracle_sql() via DuckDB: row count, column-name set, and an
order-insensitive value comparison (sorted by all columns, floats rounded).

Usage: python tools/check_oracle.py [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm_cell(x) for x in v)
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    normed = [tuple(norm_cell(r[i]) for i in idx) for r in rows]
    # NULL-safe ordering (rollup rows contain None next to strings)
    return sorted(normed, key=lambda row: tuple((v is None, str(v)) for v in row))


def main():
    import __spark_entry__ as entrymod
    from spanluke_spark.session import get_spark

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    only = set(sys.argv[1:])

    spark = get_spark(app_name="oracle_check", master="local[8]", shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, oq = entrymod.queries(), entrymod.oracle_sql()
    # retired-from-registry queries keep local value checks (53 total)
    qs = {**qs, **entrymod.extra_queries()}
    oq = {**oq, **entrymod.extra_oracle_sql()}
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {exc}")
            failures += 1
            continue
        if name not in oq:
            print(f"OK?  {name}: rows-only check, {len(srows)} rows (no oracle)")
            continue
        try:
            cur = con.execute(oq[name])
            dcols = [d[0] for d in cur.description]
            drows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {exc}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL {name}: columns {sorted(scols)} != {sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL {name}: rowcount {len(srows)} != {len(drows)}")
            failures += 1
            continue
        s_n = norm_rows(scols, [tuple(r) for r in srows])
        d_n = norm_rows(dcols, drows)
        if s_n != d_n:
            diffs = [(a, b) for a, b in zip(s_n, d_n) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diffs}")
            failures += 1
            continue
        print(f"PASS {name}: {len(srows)} rows")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
