"""Z-order clustering gates (storage/zorder.py): Morton key bit
correctness vs a Python reference, locality (consecutive keys = nearby
points), round-trip row fidelity, and the actual PRUNING claim — a 2-D
box predicate over the z-ordered layout touches a small fraction of the
files while the same predicate over a hash-scattered layout touches
nearly all of them.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from spanluke_spark.storage.zorder import (
    files_with_matches,
    morton_key,
    write_zordered,
)


def ref_morton(a, b, bits=10):
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i + 1)
        z |= ((b >> i) & 1) << (2 * i)
    return z


def test_morton_key_matches_reference(spark):
    rng = np.random.default_rng(42)
    rows = [(int(x), int(y)) for x, y in rng.integers(0, 1024, (200, 2))]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r.a, r.b): r.z
        for r in df.select("a", "b", morton_key(F.col("a"), F.col("b")).alias("z")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == ref_morton(a, b), (a, b)


def test_zorder_prunes_2d_box(spark, tmp_path):
    n = 40_000
    # two INDEPENDENT uniform axes (affine maps of id share id%1024 and
    # collapse the 2-D space onto a curve the box could miss entirely)
    df = (
        spark.range(n)
        .select(
            F.pmod(F.xxhash64("id"), F.lit(1024)).alias("user_bucket"),
            F.pmod(F.xxhash64("id", F.lit("day")), F.lit(1024)).alias(
                "day_bucket"
            ),
            F.col("id").alias("payload"),
        )
    )
    zpath = str(tmp_path / "z")
    spath = str(tmp_path / "scattered")
    write_zordered(df, zpath, F.col("user_bucket"), F.col("day_bucket"),
                   n_files=16)
    df.repartition(16).write.mode("overwrite").parquet(spath)

    def box(d):
        return d.where(
            (F.col("user_bucket").between(100, 160))
            & (F.col("day_bucket").between(200, 260))
        )

    zdf, sdf = spark.read.parquet(zpath), spark.read.parquet(spath)
    # identical answers on both layouts
    assert sorted(r.payload for r in box(zdf).collect()) == sorted(
        r.payload for r in box(sdf).collect()
    )
    z_files, s_files = files_with_matches(box(zdf)), files_with_matches(box(sdf))
    # the 2-D box covers ~0.35% of the key space: the z-layout confines
    # it to a few curve segments; the scattered layout hits every file
    assert s_files >= 14
    assert z_files <= s_files // 2
    assert z_files <= 6


def test_zorder_roundtrip_fidelity(spark, tmp_path):
    df = spark.range(5000).select(
        (F.col("id") % 64).alias("a"),
        (F.col("id") * 7 % 64).alias("b"),
        F.col("id").alias("v"),
    )
    p = str(tmp_path / "z2")
    write_zordered(df, p, F.col("a"), F.col("b"), n_files=4, bits=6)
    back = spark.read.parquet(p)
    assert back.columns == ["a", "b", "v"]  # the _z helper column is dropped
    assert sorted(r.v for r in back.collect()) == list(range(5000))
