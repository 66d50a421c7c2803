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
