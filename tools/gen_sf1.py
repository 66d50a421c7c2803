"""Deterministic sf1 generator: 10x sf0.1 by keyed replication.

The driver's testdata stops at sf0.1 (TESTDATA.md); the scale rehearsal
(VERDICT r4 "Next round" 8) needs one decade more to catch anything
super-linear that sf0.1 hides. This synthesizes sf1 from sf0.1 itself —
seeded by the driver's own seed-42 tables, no external data — with the
standard scale-up discipline:

- fact tables get 10 copies with CONSISTENT key offsets (the same
  custkey offset in customer and orders, the same orderkey offset in
  orders and lineitem, ...), so per-copy join fan-out matches sf0.1 and
  the scaled universe has 10x distinct keys (not 10x duplicates of the
  same keys, which would shrink shuffle key-spaces and grow per-key
  groups into an artificially skewed workload);
- dimension tables (region, nation) stay fixed, as TPC-H scaling does;
- `documents.text` is perturbed per copy (every 7th word replaced with a
  copy-unique token) so copies are NEITHER exact nor near duplicates:
  any 5-word shingle window containing a replaced word differs, leaving
  Jaccard vs the original far below near-dup thresholds — the dedup
  benchmarks keep their sf0.1 cluster-size distribution instead of
  collapsing 90% of the corpus into 10-copy clusters;
- copy 0 is byte-identical to sf0.1, so sf0.1 is a subset of sf1.

Embeddings are replicated with offset ids but unperturbed vectors (the
rehearsal's bench set never touches them; documented here so an sf1
embedding-dedup run is known to see 10x exact clusters).

Usage: python3 tools/gen_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key columns that must share one offset universe per logical entity
KEY_UNIVERSES = {
    "custkey": ["customer.c_custkey", "orders.o_custkey"],
    "orderkey": ["orders.o_orderkey", "lineitem.l_orderkey"],
    "partkey": ["part.p_partkey", "lineitem.l_partkey"],
    "suppkey": ["supplier.s_suppkey", "lineitem.l_suppkey"],
    "eventid": ["events.event_id"],
    "userid": ["events.user_id"],
    "docid": ["documents.doc_id"],
    "vecid": ["embeddings.vec_id"],
}

FIXED = ["region", "nation"]
SCALED = ["customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _offsets(tables: dict[str, pa.Table]) -> dict[str, int]:
    """One power-of-ten stride per key universe (readable scaled keys:
    copy c of key k is c*stride + k)."""
    strides: dict[str, int] = {}
    for universe, cols in KEY_UNIVERSES.items():
        mx = 0
        for ref in cols:
            t, c = ref.split(".")
            mx = max(mx, int(pa.compute.max(tables[t][c]).as_py()))
        strides[universe] = 10 ** len(str(mx))
    return strides


def _perturb_texts(texts: list[str], copy: int) -> list[str]:
    """Replace every 7th word with a copy-unique token — deterministic,
    breaks word-shingle windows, keeps length/shape statistics close."""
    out = []
    for di, text in enumerate(texts):
        words = text.split(" ")
        for wi in range(3, len(words), 7):
            words[wi] = f"sfw{copy}x{(di * 31 + wi) % 9973}"
        out.append(" ".join(words))
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    os.makedirs(out_dir, exist_ok=True)
    tables = {t: pq.read_table(f"{SRC}/{t}.parquet") for t in FIXED + SCALED}
    strides = _offsets(tables)
    col_to_universe = {
        ref: universe for universe, refs in KEY_UNIVERSES.items() for ref in refs
    }

    for t in FIXED:
        pq.write_table(tables[t], f"{out_dir}/{t}.parquet")
        print(f"{t}: {tables[t].num_rows} rows (fixed dim)")

    for t in SCALED:
        base = tables[t]
        copies = []
        for c in range(COPIES):
            cols = {}
            for name in base.column_names:
                col = base[name]
                universe = col_to_universe.get(f"{t}.{name}")
                if universe is not None and c > 0:
                    col = pa.compute.add(col, c * strides[universe])
                cols[name] = col
            if t == "documents" and c > 0:
                texts = _perturb_texts(base["text"].to_pylist(), c)
                cols["text"] = pa.array(texts, type=base.schema.field("text").type)
                cols["n_chars"] = pa.array(
                    np.array([len(x) for x in texts]),
                    type=base.schema.field("n_chars").type,
                )
            copies.append(pa.table(cols, schema=pa.schema(
                [base.schema.field(n) for n in base.column_names]
            )))
        # Directory-of-files layout, one file per copy, 128k-row groups —
        # the shape a real large table has (many files), so Spark's scan
        # splits by file/row-group instead of being capped by a monolith.
        tdir = f"{out_dir}/{t}.parquet"
        os.makedirs(tdir, exist_ok=True)
        for c, tab in enumerate(copies):
            pq.write_table(tab, f"{tdir}/part-{c:02d}.parquet", row_group_size=1 << 17)
        print(f"{t}: {base.num_rows} -> {sum(x.num_rows for x in copies)} rows ({COPIES} files)")


if __name__ == "__main__":
    main()
