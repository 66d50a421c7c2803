"""Image dHash — unit anchors (gradient/flat grids), brightness-shift
invariance, grid contract, and the distributed encode->decode->hash
round trip vs driver-side hashing, plus corrupt-payload policy."""

from __future__ import annotations

import numpy as np
import pytest

from spanluke_spark.multimodal.codecs import encode_bmp
from spanluke_spark.multimodal.phash import (
    dhash_halves,
    gray_int,
    image_dhash,
    mean_pool,
)


def test_flat_grid_hashes_zero():
    assert dhash_halves(np.full((8, 9), 7, dtype=np.int64)) == (0, 0)


def test_increasing_rows_hash_all_ones():
    grid = np.tile(np.arange(9, dtype=np.int64), (8, 1))
    hi, lo = dhash_halves(grid)
    assert hi == lo == 0xFFFFFFFF


def test_single_bit_position():
    grid = np.zeros((8, 9), dtype=np.int64)
    grid[2, 4] = -1  # grid[2,4] < grid[2,3] and grid[2,5] > grid[2,4]
    hi, lo = dhash_halves(grid)
    assert lo == 0
    assert hi == 1 << (2 * 8 + 4)


def test_grid_contract():
    with pytest.raises(ValueError, match="8x9"):
        dhash_halves(np.zeros((9, 8), dtype=np.int64))
    with pytest.raises(ValueError, match="multiple"):
        mean_pool(np.zeros((10, 18), dtype=np.int64))


def test_mean_pool_exact_floor():
    g = np.arange(16 * 18, dtype=np.int64).reshape(16, 18)
    pooled = mean_pool(g)
    assert pooled.shape == (8, 9)
    assert pooled[0, 0] == (g[0, 0] + g[0, 1] + g[1, 0] + g[1, 1]) // 4


def test_brightness_shift_invariance():
    rng = np.random.RandomState(5)
    g = rng.randint(0, 200, size=(8, 9)).astype(np.int64)
    assert dhash_halves(g) == dhash_halves(g + 37)


def test_distributed_matches_driver(spark):
    rng = np.random.RandomState(11)
    imgs = {
        k: rng.randint(0, 256, size=(16, 18, 3)).astype(np.uint8)
        for k in range(6)
    }
    rows = [(k, bytearray(encode_bmp(a))) for k, a in imgs.items()]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = {
        r["media_id"]: (r["dhash_hi"], r["dhash_lo"])
        for r in image_dhash(df).collect()
    }
    for k, a in imgs.items():
        assert got[k] == dhash_halves(mean_pool(gray_int(a))), k


def test_corrupt_payload_policy(spark):
    rows = [
        (0, bytearray(encode_bmp(np.zeros((16, 18, 3), dtype=np.uint8)))),
        (1, bytearray(b"BMgarbage")),
    ]
    df = spark.createDataFrame(rows, "media_id: long, payload: binary")
    got = {r["media_id"]: r for r in image_dhash(df, on_error="null").collect()}
    assert got[0]["dhash_hi"] is not None
    assert got[1]["dhash_hi"] is None and got[1]["dhash_lo"] is None
    with pytest.raises(Exception):
        image_dhash(df, on_error="raise").collect()
