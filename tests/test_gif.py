"""GIF decoder (multimodal/gif.py): LZW decode, interlacing, sub-block
chains, dispatch, and the Spark media kernel path."""

from __future__ import annotations

import numpy as np
import pytest

from spanluke_spark.multimodal.gif import decode_gif, encode_gif


def _img(w=13, h=9, n_colors=7, seed=3):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, (n_colors, 3), dtype=np.uint8)
    return palette[rng.integers(0, n_colors, (h, w))]


def test_roundtrip_exact():
    for n_colors in (2, 3, 7, 64, 256):
        a = _img(17, 11, n_colors=n_colors, seed=n_colors)
        assert np.array_equal(decode_gif(encode_gif(a)), a), n_colors


def test_interlaced_roundtrip_exact():
    for h in (1, 2, 5, 8, 9):  # heights exercising every interlace pass mix
        a = _img(7, h, n_colors=5, seed=h)
        assert np.array_equal(decode_gif(encode_gif(a, interlace=True)), a), h


def test_long_pixel_stream_multiple_clears_and_subblocks():
    """> 255-byte LZW body forces multi-sub-block framing, and > budget
    pixels force mid-stream CLEAR codes — both must round-trip."""
    a = _img(64, 48, n_colors=250, seed=1)
    payload = encode_gif(a)
    assert len(payload) > 1000
    assert np.array_equal(decode_gif(payload), a)


def test_corrupt_gifs_raise_valueerror():
    import random

    good = encode_gif(_img())
    rng = random.Random(5)
    for trial in range(150):
        b = bytearray(good)
        mode = trial % 3
        if mode == 0:
            b = b[: rng.randint(6, len(b) - 1)]
        elif mode == 1:
            for _ in range(rng.randint(1, 5)):
                b[rng.randrange(6, len(b))] = rng.randrange(256)
        else:
            i = rng.randrange(6, len(b))
            b[i:i] = bytes(rng.randrange(256) for _ in range(rng.randint(1, 8)))
        try:
            decode_gif(bytes(b))
        except ValueError:
            pass  # the only acceptable failure mode
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTAGIF")
    # regression: a corrupt LZW minimum-code-size byte (up to 255) must be
    # rejected up front — 1 << mcs would otherwise size the literal table
    # at 2^255 entries (a hang, found by this fuzz)
    b = bytearray(good)
    i = b.index(0x2C)  # image descriptor; mcs byte follows the 9-byte header
    b[i + 10] = 72
    with pytest.raises(ValueError, match="minimum code size"):
        decode_gif(bytes(b))


def test_dispatch_and_spark_kernel(spark):
    from spanluke_spark.multimodal.codecs import decode_image, image_features
    from spanluke_spark.multimodal.media import extract_media_features

    imgs = [_img(9, 7, 5, 1), _img(12, 12, 30, 2)]
    rows = [
        (i, "image", bytearray(encode_gif(a, interlace=(i == 1))))
        for i, a in enumerate(imgs)
    ]
    assert np.array_equal(decode_image(bytes(rows[0][2])), imgs[0])
    df = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    feats = {
        r.media_id: r.features
        for r in extract_media_features(df, deterministic_fake=False).collect()
    }
    for i, a in enumerate(imgs):
        assert feats[i] == pytest.approx(image_features(a), rel=1e-6, abs=1e-7), i
