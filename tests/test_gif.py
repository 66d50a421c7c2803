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


def _real_lzw_compress(pixels, mcs):
    """Genuine GIF LZW compressor (dictionary growth, width changes) — the
    fixture encoder only emits literal codes, which never exercises the
    decoder's dictionary chains or the KwKwK case."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    acc = nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    width = mcs + 1
    next_code = eoi + 1
    put(clear, width)
    w = ()
    for p in map(int, pixels):
        wk = w + (p,)
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                # GIF encoders grow width when next_code EXCEEDS the range
                width += 1
        w = (p,)
    put(table[w], width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _wrap_gif(body, palette, w, h, mcs):
    import struct

    size = len(palette)
    gct_bits = size.bit_length() - 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h) + bytes([0x80 | (gct_bits - 1), 0, 0])
    out += palette.tobytes()
    out += bytes([0x2C]) + struct.pack("<4H", 0, 0, w, h) + bytes([0]) + bytes([mcs])
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)


def test_real_lzw_streams_roundtrip():
    """Dictionary-growing LZW streams (incl. the KwKwK pattern from runs
    and deep chains from repetitive content) decode exactly."""
    rng = np.random.default_rng(0)
    palette = np.zeros((4, 3), dtype=np.uint8)
    palette[:] = [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]]
    cases = [
        np.zeros(64, dtype=np.int64),                         # pure run -> KwKwK
        np.tile([0, 1], 50),                                  # abab chains
        np.tile([0, 1, 2, 3], 400),                           # width growth
        rng.integers(0, 4, 5000),                             # deep dictionary
    ]
    for pix in cases:
        w = len(pix)
        body = _real_lzw_compress(pix, mcs=2)
        got = decode_gif(_wrap_gif(body, palette, w, 1, 2))
        assert np.array_equal(got[0], palette[pix]), len(pix)
    # large compressible image through the container end-to-end
    big = np.repeat(rng.integers(0, 4, (60, 1)), 300, axis=1)  # 60x300 runs
    body = _real_lzw_compress(big.reshape(-1), mcs=2)
    got = decode_gif(_wrap_gif(body, palette, 300, 60, 2))
    assert np.array_equal(got, palette[big])
