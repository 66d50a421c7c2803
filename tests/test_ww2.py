"""Gates for etl/runs.ww_two_sample: exact python replay (runs of
the label sequence in value order, one-division z^2), the
cross-module identity vs runs_test fed the sorted labels,
complete-separation minimum r == 2 fires with direction 'clumping',
perfect interleaving fires 'alternating', same-distribution quiet,
declared no-ties audit."""

from __future__ import annotations

from spanluke_spark.etl.runs import runs_test, ww_two_sample


def py_ww(rows):
    srt = sorted(rows, key=lambda t: t[1])
    labs = [1 if g == 0 else 0 for g, _ in srt]
    n = len(labs)
    n1 = sum(labs)
    n2 = n - n1
    r = 1 + sum(1 for i in range(1, n) if labs[i] != labs[i - 1])
    den = 2 * n1 * n2 * (2 * n1 * n2 - n)
    z2 = (
        (r * n - n - 2 * n1 * n2) ** 2 * (n - 1) * 1000 // den
        if den > 0
        else None
    )
    return n1, n2, r, z2


def _mk(spark, rows):
    return spark.createDataFrame(rows, "grp long, x long")


def test_ww2_replay_and_identity(spark):
    rows = [(i % 2, i * 13 + (i * 7) % 11 * 2 + i % 2) for i in range(40)]
    assert len({x for _, x in rows}) == 40
    n1, n2, r, z2 = py_ww(rows)
    got = ww_two_sample(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert (got.n1, got.n2, got.r, got.z2_milli) == (n1, n2, r, z2)
    # cross-module identity: runs_test over the value-ordered labels
    ident = runs_test(
        _mk(spark, rows).selectExpr(
            "x as pos", "cast(grp = 0 as boolean) as x"
        )
    ).collect()[0]
    assert (ident.r, ident.z2_milli) == (got.r, got.z2_milli)


def test_ww2_separation_fires_clumping(spark):
    rows = [(0, v) for v in range(15)] + [
        (1, v + 100) for v in range(15)
    ]
    got = ww_two_sample(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.r == 2
    assert got.direction == "clumping"
    assert got.sig is True


def test_ww2_interleaved_fires_alternating(spark):
    rows = [(i % 2, i) for i in range(30)]
    got = ww_two_sample(_mk(spark, rows)).collect()[0]
    assert got.r == 30
    assert got.direction == "alternating"
    assert got.sig is True


def test_ww2_same_distribution_quiet(spark):
    # labels assigned by a hash-ish parity uncorrelated with value
    rows = [((i * 7 + 3) % 5 % 2, i) for i in range(40)]
    got = ww_two_sample(_mk(spark, rows)).collect()[0]
    assert got.status == "ok"
    assert got.sig is False


def test_ww2_ties_audit(spark):
    rows = [(0, 1), (0, 3), (1, 3), (1, 5), (0, 7), (1, 9)]
    got = ww_two_sample(_mk(spark, rows)).collect()[0]
    assert got.status == "ties"
    assert got.r is None and got.z2_milli is None
