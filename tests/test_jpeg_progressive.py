"""Progressive JPEG (SOF2) decode — multimodal/jpeg.py.

Three independent kinds of evidence:
- a HAND-CRAFTED SOF2 stream (every byte written out here from T.81
  Annex G rules: DC first + DC refine + AC first + AC refine with an EOB
  run carrying a buffered correction bit) whose expected pixels are
  computed from the DCT math directly in the test — pins the decoder to
  the public spec independent of our encoder;
- pixel-IDENTITY between progressive and baseline round-trips of the
  same image (both encoders quantize to the same coefficients, so any
  scan-accounting drift in either progressive codec half shows up as a
  hard mismatch, not a tolerance miss);
- the crawl-robustness contract: truncation / byte flips / missing EOI
  on progressive payloads raise ValueError, never leak internals.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spanluke_spark.multimodal.jpeg import (
    DCT_C,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _rng(seed=0):
    return np.random.default_rng(seed)


def _noise(h, w, seed=0):
    return _rng(seed).integers(0, 256, (h, w, 3)).astype(np.uint8)


# ---------------------------------------------------------------------------
# spec pin: hand-crafted SOF2 stream
# ---------------------------------------------------------------------------


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _handcrafted_progressive():
    """8x8 grayscale SOF2 stream, quant table all-16s, true coefficients
    DC=6 and AC[zigzag 1]=-13, delivered over four scans:

    scan 1 (DC first, Al=1):   codes DC>>1 = 3 -> category 2, bits '11'
    scan 2 (AC first, Al=1):   codes -13 -> -6 (cat 3, bits '001'), EOB0
    scan 3 (DC refine, Al=0):  appends DC bit 0 -> 6
    scan 4 (AC refine, Al=0):  no new significance -> EOB0 with ONE
                               buffered correction bit (13 & 1 = 1),
                               restoring -12 -> -13

    Huffman tables are written longhand: DC table {cat 2 -> '0'},
    AC table {0x03 -> '0', 0x00 (EOB0) -> '10'}."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    # SOF2: 8-bit, 8x8, one component (id 1, 1x1 sampling, quant slot 0)
    out += _seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    # DC slot 0: one code of length 1 -> symbol 2 (code '0')
    out += _seg(0xC4, bytes([0x00] + [1] + [0] * 15 + [2]))
    # AC slot 0: '0' -> 0x03, '10' -> 0x00 (EOB0)
    out += _seg(0xC4, bytes([0x10] + [1, 1] + [0] * 14 + [0x03, 0x00]))

    def sos(ss, se, ah, al):
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    out += sos(0, 0, 0, 1) + bytes([0b01111111])  # '0' + '11' + 1-pad
    out += sos(1, 63, 0, 1) + bytes([0b00011011])  # '0'+'001'+'10' + 1-pad
    out += sos(0, 0, 1, 0) + bytes([0b01111111])  # refine bit '0' + 1-pad
    out += sos(1, 63, 1, 0) + bytes([0b10111111])  # EOB0 '10' + bit '1' + pad
    out += b"\xff\xd9"
    return bytes(out)


def test_handcrafted_sof2_stream_pins_decoder_to_spec():
    got = decode_jpeg(_handcrafted_progressive())
    F = np.zeros((8, 8))
    F[0, 0] = 6 * 16  # dequantized DC
    F[0, 1] = -13 * 16  # dequantized AC at zigzag position 1 (raster 0,1)
    want = np.clip(np.round(DCT_C.T @ F @ DCT_C + 128.0), 0, 255).astype(np.uint8)
    assert got.shape == (8, 8, 3)
    assert np.array_equal(got[:, :, 0], want)
    assert np.array_equal(got[:, :, 0], got[:, :, 1])  # grayscale replicated


def test_handcrafted_sof2_missing_eoi_truncation():
    b = _handcrafted_progressive()
    with pytest.raises(ValueError, match="EOI|truncated|marker"):
        decode_jpeg(b[:-2])


# ---------------------------------------------------------------------------
# progressive round trip == baseline round trip, pixel-identical
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "h,w,kw",
    [
        (16, 16, {}),
        (24, 17, {}),  # MCU-partial edge blocks
        (33, 25, {"subsample": True}),  # 4:2:0 odd dims: non-interleaved rasters
        (19, 21, {"grayscale": True}),
        (32, 32, {"restart_interval": 3}),  # RSTn resets preds + EOB runs
        (40, 24, {"restart_interval": 2, "subsample": True}),
        (48, 48, {"quality": 30}),  # coarse quant: long zero runs, EOBRUN spans
    ],
)
def test_progressive_equals_baseline_roundtrip(h, w, kw):
    q = kw.pop("quality", 90)
    arr = _noise(h, w, seed=h * 100 + w)
    base = decode_jpeg(encode_jpeg(arr, quality=q, **kw))
    prog = decode_jpeg(encode_jpeg_progressive(arr, quality=q, **kw))
    assert np.array_equal(base, prog)


def test_progressive_flat_image_pure_eobrun():
    """An all-flat image has zero AC everywhere: every AC scan is one long
    EOB run (the maximal-EOBRUN path), and refinement scans carry only
    buffered bits."""
    arr = np.full((64, 48, 3), 130, np.uint8)
    base = decode_jpeg(encode_jpeg(arr))
    prog = decode_jpeg(encode_jpeg_progressive(arr))
    assert np.array_equal(base, prog)


def test_progressive_randomized_sweep():
    rng = _rng(7)
    for trial in range(15):
        h = int(rng.integers(8, 64))
        w = int(rng.integers(8, 64))
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        sub = bool(rng.integers(0, 2))
        gray = not sub and trial % 3 == 0
        kw = dict(
            quality=int(rng.integers(20, 96)),
            subsample=sub,
            grayscale=gray,
            restart_interval=int(rng.integers(0, 4)),
        )
        base = decode_jpeg(encode_jpeg(arr, **kw))
        prog = decode_jpeg(encode_jpeg_progressive(arr, **kw))
        assert np.array_equal(base, prog), (trial, h, w, kw)


# ---------------------------------------------------------------------------
# crawl contract: corruption -> ValueError, never internals
# ---------------------------------------------------------------------------


def test_progressive_corrupt_inputs_always_valueerror():
    import random

    good = encode_jpeg_progressive(_noise(24, 16, seed=3), quality=85)
    rng = random.Random(11)
    for trial in range(200):
        b = bytearray(good)
        mode = trial % 3
        if mode == 0:
            b = b[: rng.randint(2, len(b) - 1)]
        elif mode == 1:
            for _ in range(rng.randint(1, 6)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        else:
            i = rng.randrange(len(b))
            b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 16)))
        try:
            decode_jpeg(bytes(b))
        except ValueError:
            pass  # the only acceptable failure mode


def test_progressive_through_decode_image_dispatch():
    """decode_image routes progressive JPEG natively now — no PIL gate."""
    from spanluke_spark.multimodal.codecs import decode_image

    arr = _noise(20, 14, seed=5)
    payload = encode_jpeg_progressive(arr, quality=90)
    assert np.array_equal(decode_image(payload), decode_jpeg(payload))
