"""Baseline JPEG codec (pure numpy + stdlib — multimodal/jpeg.py).

Two kinds of evidence:
- round trips through our own encoder (4:4:4, 4:2:0, grayscale, restart
  markers) with error bounds that only hold if dequantize/IDCT/upsample
  are right;
- HAND-CRAFTED entropy streams with expected pixels derived from the
  T.81 math directly in the test — these pin the decoder to the public
  spec independent of the encoder (a complementary encoder/decoder bug
  pair cannot cancel out here).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spanluke_spark.multimodal.jpeg import (
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
)


def _smooth(w=33, h=24):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [np.clip(xx * 4 + 10, 0, 255), np.clip(yy * 6 + 5, 0, 255), np.clip(255 - xx * 3, 0, 255)],
        axis=2,
    ).astype(np.uint8)


def _err(a, b):
    return np.abs(a.astype(np.int64) - b.astype(np.int64))


def test_roundtrip_444_quality_bounds():
    img = _smooth()
    for q, bound in ((95, 6), (90, 8), (75, 16)):
        out = decode_jpeg(encode_jpeg(img, quality=q))
        assert out.shape == img.shape
        assert _err(out, img).max() <= bound, q


def test_roundtrip_420_odd_dimensions():
    # odd dims force edge padding in both luma (16-mult) and chroma (8-mult)
    img = _smooth(21, 13)
    out = decode_jpeg(encode_jpeg(img, quality=90, subsample=True))
    assert out.shape == img.shape
    assert _err(out, img).max() <= 40  # chroma is 2x2-averaged: looser bound
    # luminance is full-resolution even in 4:2:0
    lum = lambda a: 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
    assert np.abs(lum(out) - lum(img)).max() <= 12


def test_restart_markers_change_bytes_not_pixels():
    img = _smooth(40, 24)
    plain = encode_jpeg(img, quality=90)
    rst = encode_jpeg(img, quality=90, restart_interval=2)
    assert b"\xff\xdd" in rst and b"\xff\xd0" in rst
    assert b"\xff\xdd" not in plain
    # identical quantized coefficients -> bit-identical decoded pixels
    assert np.array_equal(decode_jpeg(plain), decode_jpeg(rst))


def test_grayscale_single_component():
    img = _smooth(17, 9)
    out = decode_jpeg(encode_jpeg(img, quality=95, grayscale=True))
    assert out.shape == img.shape
    assert np.array_equal(out[:, :, 0], out[:, :, 1])
    lum = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    assert np.abs(out[:, :, 0].astype(np.float64) - lum).max() <= 4


def test_solid_color_near_exact():
    solid = np.full((16, 16, 3), (200, 30, 90), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(solid, quality=95))
    assert _err(out, solid).max() <= 2


# ---------------------------------------------------------------------------
# spec-pinned: hand-crafted streams, expected pixels derived independently
# ---------------------------------------------------------------------------


def _minimal_gray_jpeg(scan: bytes) -> bytes:
    """8x8 single-component baseline JPEG around a hand-built entropy scan,
    using the UNSCALED Annex-K luma quant table and Annex-K luma Huffman
    tables."""

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(QUANT_LUMA[ZIGZAG].astype(np.uint8)))
    out += seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
    out += seg(0xC4, bytes([0x00] + DC_LUMA_BITS + DC_LUMA_VALS))
    out += seg(0xC4, bytes([0x10] + AC_LUMA_BITS + AC_LUMA_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += scan + b"\xff\xd9"
    return bytes(out)


def test_handcrafted_dc_only_block():
    """DC diff = +1, no AC: canonical Annex-K codes give the bit stream
    010 1 1010 (DC cat-1 code, magnitude bit, EOB) = 0x5A. Dequantized
    DC = 1 * Q[0] = 16; the orthonormal IDCT of a DC-only block is
    16/8 + 128 = 130 everywhere."""
    got = decode_jpeg(_minimal_gray_jpeg(bytes([0x5A])))
    assert got.shape == (8, 8, 3)
    assert np.all(got == 130)


def test_handcrafted_single_ac_coefficient():
    """DC diff = 0 (code 00), then AC run=0/size=1 (symbol 0x01, code 00)
    with magnitude bit 1, then EOB (1010): bits 00 00 1 1010 1111111
    -> bytes 0x0D 0x7F. Coefficient +1 lands at zigzag index 1 = raster
    (0, 1), dequantized by Q[zigzag 1] = 11; expected pixels follow the
    T.81 IDCT formula computed here from first principles."""
    got = decode_jpeg(_minimal_gray_jpeg(bytes([0x0D, 0x7F])))
    xs = np.arange(8)
    # a(0) * a(1) * F01 * cos((2x+1) * pi / 16), constant down each column
    row = np.sqrt(1 / 8) * np.sqrt(2 / 8) * 11.0 * np.cos((2 * xs + 1) * np.pi / 16)
    want = np.clip(np.round(row + 128.0), 0, 255).astype(np.uint8)
    assert np.array_equal(got[:, :, 0], np.tile(want, (8, 1)))


def test_unsupported_sof_and_corrupt_raise():
    """Lossless/hierarchical/arithmetic SOFs stay outside scope; a baseline
    stream whose SOF0 is flipped to SOF2 fails the progressive validator
    (its single scan declares Ss=0 with Se=63 — illegal for SOF2)."""
    img = _smooth(8, 8)
    b = bytearray(encode_jpeg(img))
    i = b.index(b"\xff\xc0")
    b[i + 1] = 0xC3  # SOF3 (lossless) — genuinely unsupported
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(b))
    b[i + 1] = 0xC2  # SOF2 with a baseline full-band scan: spec-invalid
    with pytest.raises(ValueError, match="Ss=0 requires Se=0"):
        decode_jpeg(bytes(b))
    with pytest.raises(ValueError):
        decode_jpeg(b"\x00\x01not a jpeg")


def test_dispatch_and_spark_kernel():
    """decode_image routes JPEG magic natively; the distributed media
    kernel produces features identical to the driver-side computation on
    the decoded pixels."""
    from spanluke_spark.multimodal.codecs import decode_image, image_features

    img = _smooth(12, 10)
    payload = encode_jpeg(img, quality=90)
    assert np.array_equal(decode_image(payload), decode_jpeg(payload))
    # lossy but close: decoded pixels stay near the original
    assert _err(decode_image(payload), img).max() <= 10
    assert image_features(decode_image(payload)) == pytest.approx(
        image_features(decode_jpeg(payload)), abs=0
    )


def test_jpeg_features_through_spark(spark):
    from spanluke_spark.multimodal.codecs import image_features
    from spanluke_spark.multimodal.media import extract_media_features

    imgs = [_smooth(9, 7), _smooth(16, 16), _smooth(21, 13)]
    rows = [
        (i, "image", bytearray(encode_jpeg(a, quality=90, subsample=(i % 2 == 1))))
        for i, a in enumerate(imgs)
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary").repartition(3)
    feats = {
        r.media_id: r.features
        for r in extract_media_features(df, deterministic_fake=False).collect()
    }
    for i, a in enumerate(imgs):
        want = image_features(decode_jpeg(bytes(rows[i][2])))
        assert feats[i] == pytest.approx(want, rel=1e-6, abs=1e-7), i


def test_corrupt_inputs_always_valueerror():
    """A crawl-scale decoder must fail cleanly per record: every corruption
    mode (truncation, byte flips, garbage splices) surfaces as ValueError,
    never KeyError/IndexError/struct.error — and corrupt SOF dimensions are
    rejected before they can request giant allocations."""
    import random
    import struct as _struct

    img = _smooth(24, 16)
    good = encode_jpeg(img, quality=85)
    rng = random.Random(7)
    for trial in range(300):
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

    # oversized declared dimensions rejected up front (allocation guard)
    b = bytearray(good)
    i = bytes(b).index(b"\xff\xc0")
    _struct.pack_into(">HH", b, i + 5, 60000, 60000)
    with pytest.raises(ValueError, match="bounds"):
        decode_jpeg(bytes(b))


def test_on_error_null_skips_corrupt_records(spark):
    """Crawl policy: on_error='null' turns undecodable payloads into NULL
    features instead of failing the job; good records still decode for real."""
    from spanluke_spark.multimodal.codecs import image_features
    from spanluke_spark.multimodal.media import extract_media_features

    img = _smooth(10, 8)
    rows = [
        (0, "image", bytearray(encode_jpeg(img, quality=90))),
        (1, "image", bytearray(b"\xff\xd8\xff\xe0corrupt garbage")),
        (2, "image", None),
    ]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {
        r.media_id: r.features
        for r in extract_media_features(df, deterministic_fake=False, on_error="null").collect()
    }
    assert got[1] is None and got[2] is None
    assert got[0] == pytest.approx(image_features(decode_jpeg(bytes(rows[0][2]))), rel=1e-6)
    # strict default still raises on the corrupt record
    with pytest.raises(Exception):
        extract_media_features(df, deterministic_fake=False).collect()
