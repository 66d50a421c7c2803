"""Real image codecs (pure numpy, no libraries): PPM/BMP round-trips, the
magic-byte dispatch, and REAL pixel features + resize through the Spark
multimodal kernels."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spanluke_spark.multimodal.codecs import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_ppm,
    image_features,
    resize_nearest,
)
from spanluke_spark.multimodal.media import extract_media_features, resize_media


def _img(w=8, h=6):
    rng = np.random.default_rng(42)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def test_ppm_roundtrip_exact():
    a = _img()
    assert np.array_equal(decode_ppm(encode_ppm(a)), a)


def test_ppm_header_comments():
    a = _img(3, 2)
    raw = encode_ppm(a)
    commented = b"P6\n# a comment\n3 2\n# another\n255\n" + raw.split(b"255\n", 1)[1]
    assert np.array_equal(decode_ppm(commented), a)


def test_bmp_roundtrip_exact_including_padding():
    for w in (3, 4, 5, 8):  # 3,5 exercise 4-byte row padding
        a = _img(w, 4)
        assert np.array_equal(decode_bmp(encode_bmp(a)), a), w


def test_dispatch_and_errors():
    a = _img(4, 4)
    assert np.array_equal(decode_image(encode_ppm(a)), a)
    assert np.array_equal(decode_image(encode_bmp(a)), a)
    with pytest.raises((NotImplementedError, ValueError)):
        decode_image(b"\x89PNG\r\n\x1a\nnot really")


def test_resize_nearest_shapes_and_determinism():
    a = _img(10, 8)
    r = resize_nearest(a, 5, 4)
    assert r.shape == (4, 5, 3)
    assert np.array_equal(r, resize_nearest(a, 5, 4))
    # identity resize is exact
    assert np.array_equal(resize_nearest(a, 10, 8), a)


def test_real_features_through_spark(spark):
    """deterministic_fake=False now does REAL decode for PPM payloads: the
    feature vector equals the single-threaded numpy computation."""
    imgs = {i: _img(6 + i, 5) for i in range(4)}
    rows = [
        (i, f"u{i}", "image", "image/x-portable-pixmap", bytearray(encode_ppm(a)),
         a.shape[1], a.shape[0], 0)
        for i, a in imgs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, url string, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )
    got = {
        r["media_id"]: r["features"]
        for r in extract_media_features(media, deterministic_fake=False).collect()
    }
    for i, a in imgs.items():
        want = image_features(a, 16)
        assert np.allclose(got[i], want, atol=1e-6), i


def test_real_resize_through_spark(spark):
    a = _img(20, 10)
    media = spark.createDataFrame(
        [(1, "u", "image", "ppm", bytearray(encode_ppm(a)), 20, 10, 0)],
        "media_id long, url string, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )
    row = resize_media(media, max_w=10, max_h=10, deterministic_fake=False).collect()[0]
    assert (row["new_w"], row["new_h"]) == (10, 5)
    out = decode_ppm(bytes(row["resized"]))
    assert np.array_equal(out, resize_nearest(a, 10, 5))


def test_wav_roundtrip_and_features():
    from spanluke_spark.multimodal.codecs import (
        audio_features,
        decode_wav,
        encode_wav,
        media_features,
    )

    t = np.linspace(0, 1, 8000, endpoint=False)
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(8000, sig)
    rate, samples = decode_wav(payload)
    assert rate == 8000 and samples.shape == (8000, 1)
    assert np.allclose(samples[:, 0], sig, atol=1.0 / 32768)
    f = audio_features(rate, samples)
    assert abs(f[0] - 1.0) < 1e-9            # duration 1s
    assert f[1] == 1.0                       # mono
    assert abs(f[2] - 0.5 / np.sqrt(2)) < 1e-3  # RMS of 0.5 sine
    # magic dispatch picks the audio path
    assert media_features(payload) == f


def test_real_audio_features_through_spark(spark):
    from spanluke_spark.multimodal.codecs import audio_features, decode_wav, encode_wav

    t = np.linspace(0, 0.5, 4000, endpoint=False)
    payload = encode_wav(8000, 0.25 * np.sin(2 * np.pi * 100 * t))
    media = spark.createDataFrame(
        [(1, "u", "audio", "audio/wav", bytearray(payload), 0, 0, 500)],
        "media_id long, url string, kind string, mime string, payload binary, "
        "width int, height int, duration_ms long",
    )
    got = extract_media_features(media, deterministic_fake=False).collect()[0]
    assert np.allclose(got["features"], audio_features(*decode_wav(payload)), atol=1e-6)


# ---------------------------------------------------------------------------
# PNG (pure numpy + stdlib zlib — VERDICT r3 action item 2)
# ---------------------------------------------------------------------------

def _png_chunk(cid: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data)) + cid + data
        + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
    )


def _raw_png(w, h, depth, ctype, scanlines: bytes, plte: bytes | None = None) -> bytes:
    import struct
    import zlib

    from spanluke_spark.multimodal.codecs import PNG_MAGIC

    out = PNG_MAGIC + _png_chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
    )
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(scanlines)) + _png_chunk(b"IEND", b"")


def test_png_roundtrip_every_filter_type():
    from spanluke_spark.multimodal.codecs import decode_png, encode_png

    a = _img(7, 5)  # odd width exercises bpp offsets
    for ft in range(5):
        got = decode_png(encode_png(a, filter_type=ft))
        assert np.array_equal(got, a), f"filter {ft}"


def test_png_idat_split_across_chunks():
    import zlib

    from spanluke_spark.multimodal.codecs import PNG_MAGIC, decode_png, encode_png

    a = _img(4, 4)
    whole = encode_png(a)
    # re-split the IDAT payload into two chunks
    import struct

    body = bytearray()
    i = 8
    parts = {}
    while i + 8 <= len(whole):
        size = struct.unpack_from(">I", whole, i)[0]
        cid = whole[i + 4 : i + 8]
        parts[cid] = whole[i + 8 : i + 8 + size]
        i += 12 + size
    mid = len(parts[b"IDAT"]) // 2
    rebuilt = (
        PNG_MAGIC
        + _png_chunk(b"IHDR", parts[b"IHDR"])
        + _png_chunk(b"IDAT", parts[b"IDAT"][:mid])
        + _png_chunk(b"IDAT", parts[b"IDAT"][mid:])
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(rebuilt), a)


def test_png_grayscale_palette_and_alpha():
    from spanluke_spark.multimodal.codecs import decode_png

    # 8-bit grayscale, 2x2, filter 0 per row
    g = _raw_png(2, 2, 8, 0, b"\x00\x10\x80" + b"\x00\xff\x00")
    got = decode_png(g)
    assert got.shape == (2, 2, 3)
    assert np.array_equal(got[:, :, 0], np.array([[0x10, 0x80], [0xFF, 0x00]]))
    assert np.array_equal(got[:, :, 0], got[:, :, 2])

    # 2-bit palette, 3x2: indices 0..3 into a 4-color palette
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    # rows: idx (0,1,2) -> bits 00 01 10 xx -> byte 0b000110xx; (3,0,1) -> 0b110001xx
    sl = bytes([0, 0b00011000]) + bytes([0, 0b11000100])
    got = decode_png(_raw_png(3, 2, 2, 3, sl, plte=plte))
    exp = np.array(
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255]], [[9, 9, 9], [255, 0, 0], [0, 255, 0]]],
        dtype=np.uint8,
    )
    assert np.array_equal(got, exp)

    # gray+alpha (ctype 4): alpha dropped
    ga = _raw_png(2, 1, 8, 4, b"\x00\x40\xff\xc0\x00")
    got = decode_png(ga)
    assert np.array_equal(got[0, :, 0], np.array([0x40, 0xC0]))

    # RGBA (ctype 6): alpha dropped
    rgba = _raw_png(1, 1, 8, 6, b"\x00\x01\x02\x03\x7f")
    assert np.array_equal(decode_png(rgba)[0, 0], np.array([1, 2, 3]))


def _raw_png_interlaced(w, h, arr: np.ndarray) -> bytes:
    """Hand-built Adam7 encoder (filter 0 per scanline) — independent of the
    decoder's pass logic, so the test pins the spec's pass grid."""
    import struct
    import zlib

    from spanluke_spark.multimodal.codecs import PNG_MAGIC

    passes = [
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ]
    body = bytearray()
    for x0, y0, dx, dy in passes:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            body.append(0)
            body.extend(row.astype(np.uint8).tobytes())
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1))
        + _png_chunk(b"IDAT", zlib.compress(bytes(body)))
        + _png_chunk(b"IEND", b"")
    )


def test_png_adam7_interlaced():
    from spanluke_spark.multimodal.codecs import decode_png

    for w, h in ((11, 9), (8, 8), (3, 2), (1, 1), (16, 5)):
        a = _img(w, h)
        assert np.array_equal(decode_png(_raw_png_interlaced(w, h, a)), a), (w, h)


def test_png_16bit_reduced_to_high_byte():
    from spanluke_spark.multimodal.codecs import decode_png

    # 16-bit grayscale 2x2: big-endian samples; high bytes 0x12, 0xAB, ...
    sl = b"\x00\x12\x34\xab\xcd" + b"\x00\xff\x00\x00\x01"
    got = decode_png(_raw_png(2, 2, 16, 0, sl))
    assert np.array_equal(got[:, :, 0], np.array([[0x12, 0xAB], [0xFF, 0x00]]))
    # 16-bit RGB 1x1
    rgb = decode_png(_raw_png(1, 1, 16, 2, b"\x00\x11\x22\x33\x44\x55\x66"))
    assert np.array_equal(rgb[0, 0], np.array([0x11, 0x33, 0x55]))


def test_png_malformed_raises():
    import pytest

    from spanluke_spark.multimodal.codecs import decode_png

    with pytest.raises(ValueError, match="bit depth"):
        decode_png(_raw_png(1, 1, 4, 2, b"\x00\x00\x00"))  # sub-byte RGB invalid
    with pytest.raises(ValueError, match="size mismatch"):
        decode_png(_raw_png(2, 2, 8, 2, b"\x00\x01\x02\x03"))  # truncated raster


def test_png_features_through_spark(spark):
    """PNG payloads through the real distributed media kernel: features from
    decoded PNG == features from the same pixels as BMP."""
    from spanluke_spark.multimodal.codecs import encode_png

    imgs = [_img(6, 4), _img(5, 7), _img(3, 3)]
    rows = [(i, "image", bytearray(encode_png(a, filter_type=i % 5))) for i, a in enumerate(imgs)]
    rows += [(100 + i, "image", bytearray(encode_bmp(a))) for i, a in enumerate(imgs)]
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary").repartition(4)
    feats = {r.media_id: r.features for r in extract_media_features(df, deterministic_fake=False).collect()}
    for i in range(len(imgs)):
        assert feats[i] == pytest.approx(feats[100 + i], abs=0), i
        assert feats[i] == pytest.approx(image_features(imgs[i]), rel=1e-5, abs=1e-7), i


def test_all_codecs_fail_corrupt_inputs_as_valueerror():
    """Exception hygiene across the codec family (same contract the JPEG
    decoder is fuzzed for): truncation / byte flips / splices over PNG, BMP,
    PPM and WAV payloads surface only ValueError (or the documented
    NotImplementedError dispatch gate) — never zlib.error / struct.error /
    IndexError — and never NaN features from zero-dimension headers."""
    import math
    import random

    from spanluke_spark.multimodal.codecs import encode_wav, media_features

    rng = random.Random(11)
    img = _img(13, 9)
    t = np.linspace(0, 0.2, 1600)
    goods = {
        "png": __import__("spanluke_spark.multimodal.codecs", fromlist=["encode_png"]).encode_png(img, filter_type=2),
        "bmp": encode_bmp(img),
        "ppm": encode_ppm(img),
        "wav": encode_wav(8000, 0.3 * np.sin(880 * t)),
    }
    for name, good in goods.items():
        for trial in range(250):
            b = bytearray(good)
            mode = trial % 3
            if mode == 0:
                b = b[: rng.randint(1, len(b) - 1)]
            elif mode == 1:
                for _ in range(rng.randint(1, 6)):
                    b[rng.randrange(len(b))] = rng.randrange(256)
            else:
                i = rng.randrange(len(b))
                b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 12)))
            try:
                feats = media_features(bytes(b))
            except (ValueError, NotImplementedError):
                continue
            assert all(math.isfinite(f) for f in feats), (name, trial)


def test_png_property_roundtrip_hypothesis():
    """Property: ANY uint8 RGB image round-trips PNG exactly under every
    filter type — randomized dims and content beyond the fixed fixtures."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spanluke_spark.multimodal.codecs import decode_png, encode_png

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(1, 24),
        h=st.integers(1, 16),
        seed=st.integers(0, 2**31 - 1),
        ft=st.integers(0, 4),
    )
    def prop(w, h, seed, ft):
        a = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(a, filter_type=ft)), a)

    prop()


def test_jpeg_property_bounded_error_hypothesis():
    """Property: ANY uint8 RGB image decodes from its own q95 4:4:4 encoding
    within a fixed error bound (the quantization-table worst case), at every
    dimension shape including 1-pixel edges."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from spanluke_spark.multimodal.jpeg import decode_jpeg, encode_jpeg

    @settings(max_examples=25, deadline=None)
    @given(w=st.integers(1, 24), h=st.integers(1, 20), seed=st.integers(0, 2**31 - 1))
    def prop(w, h, seed):
        a = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(a, quality=95))
        assert out.shape == a.shape
        # tight regression bound: with the quantizer and DQT applied in the
        # same (zigzag) permutation, q95 4:4:4 round-trip error on random
        # noise stays small; a reintroduced quantize-order mismatch blows
        # max err past 200 and must fail here
        err = np.abs(out.astype(np.int64) - a.astype(np.int64))
        assert err.max() <= 60 and err.mean() <= 10

    prop()
