"""Conversion attribution — Python replay parity on random event
streams, the path-reset-at-previous-conversion rule, credit
conservation (each model's total credit == attributable conversions),
and the orphan-touch / touchless-conversion contracts."""

from __future__ import annotations

import random
from collections import Counter, defaultdict

import pytest

from spanluke_spark.etl.attribution import attribute_conversions


def _py_attr(rows):
    by_u = defaultdict(list)
    for u, ts, ch, conv in rows:
        by_u[u].append((ts, ch, conv))
    first: Counter = Counter()
    last: Counter = Counter()
    linear: Counter = Counter()
    for u, evs in by_u.items():
        evs.sort()
        path = []
        for ts, ch, conv in evs:
            if conv:
                if path:
                    first[path[0][1]] += 1
                    last[path[-1][1]] += 1
                    for _, c in path:
                        linear[c] += 1 / len(path)
                path = []
            else:
                path.append((ts, ch))
    out = {}
    for model, ctr in (
        ("first_touch", first),
        ("last_touch", last),
        ("linear", linear),
    ):
        for ch, cr in ctr.items():
            out[(ch, model)] = round(cr, 6)
    return out


def _spark_attr(spark, rows):
    df = spark.createDataFrame(
        rows, "user: long, ts: long, channel: string, is_conversion: boolean"
    )
    return {
        (r["channel"], r["model"]): r["credit"]
        for r in attribute_conversions(df).collect()
    }


def _rand_rows(seed):
    rng = random.Random(seed)
    rows = []
    ts = 0
    for _ in range(400):
        ts += 1
        rows.append(
            (
                rng.randrange(10),
                ts,
                f"c{rng.randrange(4)}",
                rng.random() < 0.15,
            )
        )
    return rows


@pytest.mark.parametrize("seed", [1, 6])
def test_matches_python_replay(spark, seed):
    rows = _rand_rows(seed)
    got = _spark_attr(spark, rows)
    want = _py_attr(rows)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_credit_conserved_per_model(spark):
    rows = _rand_rows(3)
    got = _spark_attr(spark, rows)
    want = _py_attr(rows)
    n_attributable = sum(
        v for (ch, m), v in want.items() if m == "first_touch"
    )
    for model in ("first_touch", "last_touch", "linear"):
        tot = sum(v for (ch, m), v in got.items() if m == model)
        assert tot == pytest.approx(n_attributable, abs=1e-4)


def test_path_resets_at_previous_conversion(spark):
    rows = [
        (1, 1, "a", False),
        (1, 2, "x", True),   # conv 1: path [a]
        (1, 3, "b", False),
        (1, 4, "c", False),
        (1, 5, "x", True),   # conv 2: path [b, c] — 'a' must NOT leak
    ]
    got = _spark_attr(spark, rows)
    assert got[("a", "first_touch")] == 1.0
    assert got[("b", "first_touch")] == 1.0
    assert got[("c", "last_touch")] == 1.0
    assert ("a", "linear") in got and got[("a", "linear")] == 1.0
    assert got[("b", "linear")] == 0.5 and got[("c", "linear")] == 0.5


def test_orphans_and_touchless_conversions(spark):
    rows = [
        (1, 1, "a", False),  # orphan touch: no later conversion
        (2, 1, "x", True),   # touchless conversion
    ]
    assert _spark_attr(spark, rows) == {}
