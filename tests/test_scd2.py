"""SCD type-2 history gates (storage/scd.py): planted change sequences
(A->B->B->A collapses to 3 versions), same-instant tie determinism,
interval contiguity invariants, snapshot_at time travel, and brute-force
Python parity on random CDC streams.
"""

from datetime import datetime, timedelta

import numpy as np

from spanluke_spark.storage.scd import scd2_history, snapshot_at

T0 = datetime(2024, 1, 1)


def ts(minutes):
    return T0 + timedelta(minutes=int(minutes))


def ref_scd2(rows):
    """rows: (key, ts, attr). Mirrors the documented rules."""
    by_key = {}
    for k, t, a in rows:
        by_key.setdefault(k, {}).setdefault(t, []).append(a)
    out = []
    for k, upd in by_key.items():
        seq = [(t, max(vals)) for t, vals in sorted(upd.items())]
        changes = [
            (t, a) for i, (t, a) in enumerate(seq) if i == 0 or a != seq[i - 1][1]
        ]
        for i, (t, a) in enumerate(changes):
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            out.append((k, a, t, nxt, i + 1))
    return sorted(out)


def to_df(spark, rows):
    return spark.createDataFrame(rows, "url string, warc_ts timestamp, state string")


def collect(df):
    return sorted(
        (r["url"], r["state"], r["valid_from"], r["valid_to"], r["version"])
        for r in df.collect()
    )


def test_planted_change_collapse_and_ties(spark):
    rows = [
        ("u1", ts(0), "A"),
        ("u1", ts(10), "B"),
        ("u1", ts(20), "B"),  # unchanged re-crawl: no new version
        ("u1", ts(30), "A"),  # back to A: NEW version (type 2, not type 1)
        ("u2", ts(5), "X"),
        ("u2", ts(5), "Y"),  # same-instant tie: max attr (Y) wins
    ]
    got = collect(scd2_history(to_df(spark, rows), "url", "warc_ts", ["state"]))
    assert got == ref_scd2([(k, t, a) for k, t, a in rows])
    u1 = sorted((g for g in got if g[0] == "u1"), key=lambda g: g[4])
    assert [(g[1], g[4]) for g in u1] == [("A", 1), ("B", 2), ("A", 3)]
    assert u1[0][3] == ts(10) and u1[1][3] == ts(30) and u1[2][3] is None
    (u2,) = [g for g in got if g[0] == "u2"]
    assert u2[1] == "Y" and u2[4] == 1


def test_random_cdc_parity_and_invariants(spark):
    rng = np.random.default_rng(19)
    for trial in range(3):
        rows = [
            (
                f"k{rng.integers(0, 6)}",
                ts(rng.integers(0, 40)),
                str(rng.choice(["A", "B", "C"])),
            )
            for _ in range(80)
        ]
        hist = collect(scd2_history(to_df(spark, rows), "url", "warc_ts", ["state"]))
        assert hist == ref_scd2(rows), trial
        # invariants: per key, intervals tile [first, None) with no gaps,
        # exactly one open interval, versions consecutive
        for k in {r[0] for r in hist}:
            ivs = sorted((r for r in hist if r[0] == k), key=lambda r: r[2])
            assert [r[4] for r in ivs] == list(range(1, len(ivs) + 1))
            assert sum(r[3] is None for r in ivs) == 1 and ivs[-1][3] is None
            for a, b in zip(ivs, ivs[1:]):
                assert a[3] == b[2]  # contiguous
                assert a[1] != b[1]  # consecutive versions truly differ


def test_snapshot_at_time_travel(spark):
    rows = [
        ("u1", ts(0), "A"),
        ("u1", ts(10), "B"),
        ("u2", ts(5), "X"),
    ]
    hist = scd2_history(to_df(spark, rows), "url", "warc_ts", ["state"])
    at = lambda m: {  # noqa: E731
        r["url"]: r["state"] for r in snapshot_at(hist, ts(m)).collect()
    }
    assert at(0) == {"u1": "A"}
    assert at(7) == {"u1": "A", "u2": "X"}
    assert at(10) == {"u1": "B", "u2": "X"}  # boundary: valid_from inclusive
    assert at(500) == {"u1": "B", "u2": "X"}
