"""VP8L (WebP lossless) codec gates.

Hand-crafted bitstreams pin the decoder to the published spec (RFC 9649)
independently of the fixture encoder: simple and code-length-coded prefix
codes, LZ77 direct + short-distance-map backrefs, color cache, and each
transform. A fuzz sweep enforces the uniform corrupt->ValueError codec
contract, and the Spark media kernel decodes WebP payloads end-to-end.
"""

import numpy as np
import pytest

from spanluke_spark.multimodal.webp import (
    UnsupportedWebpError,
    decode_webp,
    encode_webp_lossless,
)


class W:
    """LSB-first bit writer for hand-crafting VP8L streams in tests."""

    def __init__(self):
        self.bits = []

    def b(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)
        return self

    def code(self, value, n):  # canonical prefix codes go MSB-first
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)
        return self

    def container(self):
        out = bytearray((len(self.bits) + 7) // 8)
        for i, bit in enumerate(self.bits):
            out[i >> 3] |= bit << (i & 7)
        data = bytes(out)
        chunk = b"VP8L" + len(data).to_bytes(4, "little") + data
        if len(data) & 1:
            chunk += b"\x00"
        riff = b"WEBP" + chunk
        return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def header(w, width, height):
    w.b(0x2F, 8).b(width - 1, 14).b(height - 1, 14).b(0, 1).b(0, 3)


def simple1(w, symbol):
    w.b(1, 1).b(0, 1)
    if symbol < 2:
        w.b(0, 1).b(symbol, 1)
    else:
        w.b(1, 1).b(symbol, 8)


def simple2(w, s0, s1):
    w.b(1, 1).b(1, 1).b(1, 1).b(s0, 8).b(s1, 8)


def green_5_and_256(w):
    """Normal green code: sym 5 and sym 256 both length 1 (complete code),
    written through the code-length code with the max_symbol shortcut."""
    w.b(0, 1)  # not simple
    w.b(0, 4)  # num_code_lengths = 4 (order: 17, 18, 0, 1)
    for v in (0, 0, 1, 1):
        w.b(v, 3)
    w.b(1, 1).b(3, 3).b(255, 8)  # max_symbol = 2 + 255 = 257 emissions
    for sym in range(257):
        w.code(1 if sym in (5, 256) else 0, 1)  # cl-code: sym0->0, sym1->1


def test_simple_codes_and_literals():
    # 2x1: 2-symbol simple green code; constant red/blue/alpha
    w = W()
    header(w, 2, 1)
    w.b(0, 1).b(0, 1).b(0, 1)  # no transforms, no cache, no meta
    simple2(w, 10, 20)  # green: symbols 10, 20 (canonical: 10->0, 20->1)
    simple1(w, 5)  # red
    simple1(w, 6)  # blue
    simple1(w, 255)  # alpha
    simple1(w, 0)  # distance
    w.code(0, 1).code(1, 1)  # greens: 10 then 20
    out = decode_webp(w.container())
    assert out.tolist() == [[[5, 10, 6], [5, 20, 6]]]


def test_lz77_direct_distance():
    # 3x1: one literal then two length-1 copies at direct distance 1
    # (distance prefix symbol 13 + 5 extra bits 24 -> 121 -> dist 1)
    w = W()
    header(w, 3, 1)
    w.b(0, 1).b(0, 1).b(0, 1)
    green_5_and_256(w)  # greens: sym5 -> bit 0, sym256 (len code 0) -> bit 1
    simple1(w, 1)  # red
    simple1(w, 3)  # blue
    simple1(w, 255)  # alpha
    simple1(w, 13)  # distance prefix symbol
    w.code(0, 1)  # literal green 5
    w.code(1, 1).b(24, 5)  # backref len 1, dist extra bits
    w.code(1, 1).b(24, 5)
    out = decode_webp(w.container())
    assert out.tolist() == [[[1, 5, 3]] * 3]


def test_lz77_short_distance_map():
    # 3x2: row 0 = literals; row 1 copies row 0 via distance code 1,
    # which the 2D map resolves to (dx=0, dy=1) -> distance = xsize = 3
    w = W()
    header(w, 3, 2)
    w.b(0, 1).b(0, 1).b(0, 1)
    green_5_and_256(w)
    simple2(w, 7, 9)  # red: 7 -> bit 0, 9 -> bit 1
    simple1(w, 3)
    simple1(w, 255)
    simple1(w, 0)  # distance symbol 0 -> prefix value 1 -> short code 1
    for rbit in (0, 1, 0):  # three literals, reds 7, 9, 7
        w.code(0, 1).code(rbit, 1)
    for _ in range(3):  # three length-1 copies from the row above
        w.code(1, 1)
    out = decode_webp(w.container())
    assert out[1].tolist() == out[0].tolist()
    assert out[0].tolist() == [[7, 5, 3], [9, 5, 3], [7, 5, 3]]


def test_color_cache():
    argb_a = (255 << 24) | (0 << 16) | (0 << 8) | 3
    argb_b = (255 << 24) | (4 << 16) | (1 << 8) | 8
    ha = ((0x1E35A7BD * argb_a) & 0xFFFFFFFF) >> 31
    hb = ((0x1E35A7BD * argb_b) & 0xFFFFFFFF) >> 31
    assert ha != hb  # chosen so both survive in a 2-slot cache
    w = W()
    header(w, 4, 1)
    w.b(0, 1)  # no transforms
    w.b(1, 1).b(1, 4)  # color cache, cache_bits=1
    w.b(0, 1)  # no meta
    # green alphabet 282; syms {0, 1, 280, 281} all length 2
    w.b(0, 1).b(1, 4)  # normal; num_code_lengths = 5 (17, 18, 0, 1, 2)
    for v in (0, 0, 1, 0, 1):
        w.b(v, 3)
    w.b(1, 1).b(4, 3).b(280, 10)  # max_symbol = 282
    for sym in range(282):
        w.code(1 if sym in (0, 1, 280, 281) else 0, 1)
    simple2(w, 0, 4)  # red
    simple2(w, 3, 8)  # blue
    simple1(w, 255)
    simple1(w, 0)
    # literals A=(r0,g0,b3), B=(r4,g1,b8), then cache hits for A and B
    w.code(0b00, 2).code(0, 1).code(0, 1)
    w.code(0b01, 2).code(1, 1).code(1, 1)
    w.code(0b10 if ha == 0 else 0b11, 2)  # cache sym 280 + index of A
    w.code(0b10 if hb == 0 else 0b11, 2)
    out = decode_webp(w.container())
    assert out.tolist() == [[[0, 0, 3], [4, 1, 8], [0, 0, 3], [4, 1, 8]]]


def test_subtract_green_transform():
    w = W()
    header(w, 2, 1)
    w.b(1, 1).b(2, 2)  # one transform: SUBTRACT_GREEN
    w.b(0, 1)  # end of transforms
    w.b(0, 1).b(0, 1)  # no cache, no meta
    simple1(w, 100)  # green
    simple2(w, 10, 250)  # red residuals
    simple2(w, 20, 200)  # blue residuals
    simple1(w, 255)
    simple1(w, 0)
    w.code(0, 1).code(0, 1)  # pixel0: r_res 10, b_res 20
    w.code(1, 1).code(1, 1)  # pixel1: r_res 250, b_res 200
    out = decode_webp(w.container())
    assert out.tolist() == [[
        [(10 + 100) % 256, 100, (20 + 100) % 256],
        [(250 + 100) % 256, 100, (200 + 100) % 256],
    ]]


def test_predictor_transform_mode_T():
    # 4x2, one predictor tile with mode 2 (top); only the first residual
    # is nonzero, so every pixel inherits (10, 20, 30)
    w = W()
    header(w, 4, 2)
    w.b(1, 1).b(0, 2).b(0, 3)  # PREDICTOR, size_bits = 2 -> 4x4 tiles
    w.b(0, 1)  # end of transforms
    # tile sub-image (1x1): mode lives in the green channel
    w.b(0, 1)  # no cache
    simple1(w, 2)  # green = mode 2 (T)
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 0)
    # main image
    w.b(0, 1).b(0, 1)  # no cache, no meta
    simple2(w, 20, 0)  # green residuals
    simple2(w, 10, 0)  # red
    simple2(w, 30, 0)  # blue
    simple2(w, 0, 255)  # alpha residuals: 0 for all (canonical 0 -> bit 0)
    simple1(w, 0)
    # canonical simple2 codes sort by symbol: 0 -> code 0, nonzero -> code 1
    w.code(1, 1).code(1, 1).code(1, 1).code(0, 1)  # pixel0: (10,20,30), a=0
    for _ in range(7):
        w.code(0, 1).code(0, 1).code(0, 1).code(0, 1)  # zero residuals
    out = decode_webp(w.container())
    assert out.tolist() == [[[10, 20, 30]] * 4] * 2


def test_color_indexing_bundled():
    # 5x1, 2-color palette -> 8 indices per packed byte (width_bits=3)
    c0, c1 = (10, 20, 30), (200, 100, 50)
    w = W()
    header(w, 5, 1)
    w.b(1, 1).b(3, 2)  # COLOR_INDEXING
    w.b(1, 8)  # n_colors - 1 = 1
    w.b(0, 1)  # end of transforms
    # palette sub-image 2x1, delta-coded per channel
    w.b(0, 1)  # no cache
    d = [(c1[i] - c0[i]) % 256 for i in range(3)]
    simple2(w, *sorted((c0[1], d[1])))  # green
    simple2(w, *sorted((c0[0], d[0])))  # red
    simple2(w, *sorted((c0[2], d[2])))  # blue
    simple2(w, 0, 255)  # alpha: entry0 255, entry1 delta 0
    simple1(w, 0)
    for entry in (c0, d):
        w.code(0 if entry[1] == min(c0[1], d[1]) else 1, 1)
        w.code(0 if entry[0] == min(c0[0], d[0]) else 1, 1)
        w.code(0 if entry[2] == min(c0[2], d[2]) else 1, 1)
        w.code(1 if entry is c0 else 0, 1)  # alpha 255 then 0
    # main (packed) image 1x1: indices 1,0,1,0,1 -> green bits 0b10101
    w.b(0, 1).b(0, 1)  # no cache, no meta
    simple1(w, 0b10101)  # green
    simple1(w, 0)
    simple1(w, 0)
    simple1(w, 255)
    simple1(w, 0)
    out = decode_webp(w.container())
    assert out.tolist() == [[list(c1), list(c0), list(c1), list(c0), list(c1)]]


def test_roundtrip_exact_various_sizes():
    rng = np.random.default_rng(11)
    for h, wd in [(1, 1), (1, 7), (5, 3), (16, 16), (33, 21)]:
        img = rng.integers(0, 256, (h, wd, 3), dtype=np.uint8)
        assert np.array_equal(decode_webp(encode_webp_lossless(img)), img)


def test_unsupported_vs_corrupt():
    lossy = b"RIFF" + (20).to_bytes(4, "little") + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(UnsupportedWebpError):
        decode_webp(lossy)
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00NOPE")
    with pytest.raises(ValueError):
        decode_webp(b"RIFF" + (4).to_bytes(4, "little") + b"WEBP")


def test_fuzz_uniform_valueerror():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    good = bytearray(encode_webp_lossless(img))
    for trial in range(400):
        bad = bytearray(good)
        if trial % 3 == 0:
            bad = bad[: rng.integers(1, len(bad))]
        else:
            for _ in range(rng.integers(1, 4)):
                bad[rng.integers(0, len(bad))] = rng.integers(0, 256)
        try:
            out = decode_webp(bytes(bad))
            assert isinstance(out, np.ndarray)  # legal different decode
        except ValueError:
            pass  # includes UnsupportedWebpError; the only allowed raise


def test_decode_image_dispatch_and_media_kernel(spark):
    from spanluke_spark.multimodal.codecs import decode_image
    from spanluke_spark.multimodal.media import extract_media_features

    rng = np.random.default_rng(5)
    imgs = [rng.integers(0, 256, (8, 12, 3), dtype=np.uint8) for _ in range(4)]
    payloads = [encode_webp_lossless(im) for im in imgs]
    assert np.array_equal(decode_image(payloads[0]), imgs[0])

    df = spark.createDataFrame(
        [(i, "image", bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in extract_media_features(df, deterministic_fake=False).collect()
    }
    for i, im in enumerate(imgs):
        feats = rows[i]["features"]
        for c in range(3):
            assert feats[c] == pytest.approx(
                float(im[:, :, c].mean()) / 255.0, abs=1e-4
            )
