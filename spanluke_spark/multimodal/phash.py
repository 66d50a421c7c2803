"""Perceptual image hashing — dHash (difference hash) over pixels
decoded by the repo's real pure-numpy codecs, feeding the dedup family:
images whose 64-bit dHash matches are near-duplicate candidates, robust
to uniform brightness shifts BY CONSTRUCTION (the hash compares only
horizontally adjacent intensity differences, and a constant offset
cancels — the property the q271 fixture proves end-to-end).

Pipeline per payload, all inside one mapInPandas stage (the
media.py/audio_qa.py distributed-codec seam): decode via
codecs.decode_image (magic-byte dispatch over the in-repo BMP/PNG/JPEG/
GIF/WebP decoders) -> integer luma (299R + 587G + 114B) // 1000, exact
-> mean-pool to the canonical 8x9 dHash grid by integer floor division
(dims must be multiples of 8/9; general resampling belongs to the media
feature lane and a mismatch raises — silent interpolation would not be
oracle-replayable) -> 64 strict left<right comparisons packed row-major
into TWO 32-bit halves (dhash_hi rows 0-3, dhash_lo rows 4-7; a single
64-bit value would set the sign bit and SQL shift semantics diverge
across engines at bit 63).

Everything is exact integer arithmetic, so a DuckDB oracle can replay
the hash from a generative pixel formula WITHOUT decoding — equality
then proves the distributed encode -> decode -> hash chain bit-exact
(the q258 audio pattern, now for images). Corrupt payloads follow the
crawl policy: on_error='null' emits a (NULL, NULL) hash row, 'raise'
propagates.

Scale shape: hashing is embarrassingly parallel Arrow batches; the
near-dup join downstream is an equi-join on (dhash_hi, dhash_lo) —
16-byte keys, the exact_dedup shuffle discipline. Hamming-radius>0
search composes with dedup's SimHash pigeonhole band machinery (the
hash halves ARE 2 zero-false-negative bands for radius 1).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame

__all__ = ["dhash_halves", "gray_int", "image_dhash", "mean_pool"]


def gray_int(arr: np.ndarray) -> np.ndarray:
    """HxWx3 uint8 -> HxW exact integer luma (299R + 587G + 114B)//1000."""
    a = arr.astype(np.int64)
    return (a[:, :, 0] * 299 + a[:, :, 1] * 587 + a[:, :, 2] * 114) // 1000


def mean_pool(gray: np.ndarray, rows: int = 8, cols: int = 9) -> np.ndarray:
    """Exact floor-mean downsample to rows x cols; dims must divide."""
    h, w = gray.shape
    if h % rows or w % cols:
        raise ValueError(
            f"mean_pool: {h}x{w} not a multiple of the {rows}x{cols} grid"
        )
    bh, bw = h // rows, w // cols
    blocks = gray.reshape(rows, bh, cols, bw)
    return blocks.sum(axis=(1, 3)) // (bh * bw)


def dhash_halves(grid: np.ndarray) -> tuple[int, int]:
    """8x9 integer grid -> (hi, lo): bit (r, c) = grid[r, c+1] > grid[r, c],
    packed row-major, rows 0-3 in hi and rows 4-7 in lo (32 bits each)."""
    if grid.shape != (8, 9):
        raise ValueError(f"dhash_halves: expected 8x9 grid, got {grid.shape}")
    bits = (grid[:, 1:] > grid[:, :-1]).astype(np.int64)
    weights = 1 << np.arange(8, dtype=np.int64)
    rows = bits @ weights  # per-row byte
    hi = int((rows[:4] << (np.arange(4, dtype=np.int64) * 8)).sum())
    lo = int((rows[4:] << (np.arange(4, dtype=np.int64) * 8)).sum())
    return hi, lo


def image_dhash(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    on_error: str = "null",
) -> DataFrame:
    """(media_id, payload: binary image) -> (media_id, dhash_hi,
    dhash_lo) through the real decoders; images must decode to dims
    divisible by the 8x9 grid (fixture/canonicalized thumbnails)."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")

    def _extract(batches):
        import pandas as pd

        from spanluke_spark.multimodal.codecs import decode_image

        for pdf in batches:
            out = {"media_id": [], "dhash_hi": [], "dhash_lo": []}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    arr = decode_image(bytes(payload))
                    hi, lo = dhash_halves(mean_pool(gray_int(arr)))
                    out["media_id"].append(int(mid))
                    out["dhash_hi"].append(hi)
                    out["dhash_lo"].append(lo)
                except (ValueError, NotImplementedError):
                    if on_error == "raise":
                        raise
                    out["media_id"].append(int(mid))
                    out["dhash_hi"].append(None)
                    out["dhash_lo"].append(None)
            yield pd.DataFrame(out)

    return media.mapInPandas(
        _extract, "media_id long, dhash_hi long, dhash_lo long"
    )
