"""FLAC codec gates (multimodal/flac.py): hand-crafted spec-pinned streams
for each subframe/residual decode path (LPC, multi-partition rice, escape
partitions, wasted bits), bit-exact lossless round-trips through the
fixture encoder across stereo decorrelation modes and bit depths, CRC/MD5
negative gates, a 400-case fuzz sweep enforcing the uniform
corrupt->ValueError codec contract, and the Spark media-kernel dispatch.
"""

import struct

import numpy as np
import pytest

from spanluke_spark.multimodal.flac import (
    FLAC_MAGIC,
    _BitW,
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)

BPS = 16
RATE = 8000


def build_stream(write_subframes, block_size, ch=1, ch_code=None, bps=BPS):
    """Assemble a full single-frame FLAC stream around hand-written
    subframe bits — pins the decoder to the spec independently of the
    encoder's subframe logic."""
    n = block_size
    raw = (RATE << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    info = (
        struct.pack(">HH", 16, block_size)
        + b"\x00" * 6
        + raw.to_bytes(8, "big")
        + b"\x00" * 16  # zero MD5 -> check skipped
    )
    out = bytearray(FLAC_MAGIC + b"\x80" + len(info).to_bytes(3, "big") + info)
    w = _BitW()
    w.write(0x3FFE, 14)
    w.write(0, 2)  # reserved + fixed blocking
    w.write(7, 4)  # 16-bit block size - 1 follows
    w.write(13, 4)  # 16-bit rate (Hz) follows
    w.write((ch - 1) if ch_code is None else ch_code, 4)
    w.write({8: 1, 16: 4}[bps], 3)
    w.write(0, 1)
    w.write(0, 8)  # frame number 0
    w.write(block_size - 1, 16)
    w.write(RATE, 16)
    w.align()
    hdr = w.bytes()
    w2 = _BitW()
    w2.out = bytearray(hdr)
    w2.write(crc8(hdr), 8)
    write_subframes(w2)
    w2.align()
    body = w2.bytes()
    out += body + struct.pack(">H", crc16(body))
    return bytes(out)


def ints(decoded, bps=BPS):
    return np.round(decoded * (1 << (bps - 1))).astype(np.int64)


def test_handcrafted_lpc_subframe():
    # order-2 LPC, coefs [2, -1], shift 1: pred = (2*x[i-1] - x[i-2]) >> 1
    x = [100, 90, 85, 70, 60, 77, -40, -10]
    coefs, shift = [2, -1], 1
    res = [x[i] - ((coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift)
           for i in range(2, len(x))]

    def sub(w):
        w.write(0, 1)
        w.write(32 | (2 - 1), 6)  # LPC, order 2
        w.write(0, 1)  # no wasted bits
        for v in x[:2]:
            w.write(v, BPS)
        w.write(5 - 1, 4)  # coefficient precision 5
        w.write(shift, 5)
        for c in coefs:
            w.write(c, 5)
        w.write(0, 2)  # rice method 0
        w.write(0, 4)  # partition order 0
        p = 4
        w.write(p, 4)
        for v in res:
            u = (v << 1) ^ (v >> 63)
            w.unary(u >> p)
            w.write(u & ((1 << p) - 1), p)

    rate, dec = decode_flac(build_stream(sub, len(x)))
    assert rate == RATE
    assert ints(dec)[:, 0].tolist() == x


def test_handcrafted_multi_partition_rice():
    # fixed order 1, block 8, partition order 1 -> counts (3, 4), params (0, 2)
    x = [10, 11, 13, 12, 12, 20, 14, 9]
    res = [x[i] - x[i - 1] for i in range(1, 8)]

    def sub(w):
        w.write(0, 1)
        w.write(8 | 1, 6)  # FIXED order 1
        w.write(0, 1)
        w.write(x[0], BPS)
        w.write(0, 2)
        w.write(1, 4)  # partition order 1
        for part, p in ((res[:3], 0), (res[3:], 2)):
            w.write(p, 4)
            for v in part:
                u = (v << 1) ^ (v >> 63)
                w.unary(u >> p)
                w.write(u & ((1 << p) - 1), p)

    _, dec = decode_flac(build_stream(sub, 8))
    assert ints(dec)[:, 0].tolist() == x


def test_handcrafted_escape_partition():
    x = [17, -23, 0, 31]  # fixed order 0, raw 6-bit escape

    def sub(w):
        w.write(0, 1)
        w.write(8, 6)  # FIXED order 0
        w.write(0, 1)
        w.write(0, 2)
        w.write(0, 4)
        w.write(15, 4)  # escape
        w.write(6, 5)  # 6-bit raw residuals
        for v in x:
            w.write(v, 6)

    _, dec = decode_flac(build_stream(sub, 4))
    assert ints(dec)[:, 0].tolist() == x


def test_handcrafted_wasted_bits():
    # CONSTANT subframe with 2 wasted bits: stored value 25 -> sample 100
    def sub(w):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(1, 1)  # wasted flag
        w.unary(1)  # wasted = unary + 1 = 2
        w.write(25, BPS - 2)

    _, dec = decode_flac(build_stream(sub, 6))
    assert ints(dec)[:, 0].tolist() == [100] * 6


@pytest.mark.parametrize("stereo", ["independent", "mid_side", "left_side", "right_side"])
def test_roundtrip_exact_stereo_modes(stereo):
    rng = np.random.default_rng(11)
    t = np.arange(9000)
    x = np.stack(
        [np.sin(t / 50) * 0.6, np.cos(t / 37) * 0.4 + 0.01 * rng.standard_normal(len(t))],
        axis=1,
    )
    enc = encode_flac(44100, x, bps=16, block_size=4096, stereo=stereo)
    rate, dec = decode_flac(enc)
    assert rate == 44100 and dec.shape == x.shape
    lim = 1 << 15
    orig = np.clip(np.round(x * lim), -lim, lim - 1).astype(np.int64)
    assert np.array_equal(orig, ints(dec))  # LOSSLESS: bit-exact
    assert len(enc) < x.size * 2  # and actually compressed


@pytest.mark.parametrize(
    "shape,bps,force",
    [
        ((500,), 16, None),  # constant path (zeros)
        ((3,), 16, None),  # verbatim path (tiny block)
        ((1000,), 8, None),
        ((5000, 1), 24, None),
        ((700,), 16, "verbatim"),
        ((700,), 16, "fixed0"),
        ((700,), 16, "fixed1"),
    ],
)
def test_roundtrip_exact_depths_and_paths(shape, bps, force):
    rng = np.random.default_rng(sum(shape) + bps)
    x = np.zeros(shape) if shape == (500,) else rng.standard_normal(shape) * 0.3
    enc = encode_flac(16000, x, bps=bps, force_subframe=force)
    rate, dec = decode_flac(enc)
    lim = 1 << (bps - 1)
    a = x[:, None] if x.ndim == 1 else x
    orig = np.clip(np.round(a * lim), -lim, lim - 1).astype(np.int64)
    assert np.array_equal(orig, ints(dec, bps))


def test_integer_passthrough_roundtrip():
    rng = np.random.default_rng(4)
    pcm = rng.integers(-(1 << 15), 1 << 15, (3000, 2), dtype=np.int64)
    enc = encode_flac(22050, pcm, bps=16)
    _, dec = decode_flac(enc)
    assert np.array_equal(pcm, ints(dec))


def test_crc_and_md5_negative_gates():
    x = np.sin(np.arange(2000) / 9) * 0.5
    enc = bytearray(encode_flac(8000, x))
    bad = bytearray(enc)
    bad[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    bad = bytearray(enc)
    bad[30] ^= 0x01  # inside the STREAMINFO MD5
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    with pytest.raises(ValueError):
        decode_flac(b"fLaX" + bytes(enc[4:]))
    with pytest.raises(ValueError):
        decode_flac(bytes(enc[:40]))  # truncated mid-metadata


def test_fuzz_uniform_valueerror():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(600) * 0.2
    good = bytearray(encode_flac(8000, x))
    for trial in range(400):
        bad = bytearray(good)
        if trial % 3 == 0:
            bad = bad[: rng.integers(1, len(bad))]
        else:
            for _ in range(rng.integers(1, 4)):
                bad[rng.integers(0, len(bad))] = rng.integers(0, 256)
        try:
            rate, dec = decode_flac(bytes(bad))
            assert isinstance(dec, np.ndarray)  # legal different decode
        except ValueError:
            pass  # the only allowed raise


def test_media_features_dispatch_and_kernel(spark):
    from spanluke_spark.multimodal.codecs import audio_features, media_features
    from spanluke_spark.multimodal.media import extract_media_features

    rng = np.random.default_rng(5)
    clips = [rng.standard_normal((1500 + 300 * i, 2)) * 0.25 for i in range(3)]
    payloads = [encode_flac(8000, c, stereo="mid_side") for c in clips]
    expected = [audio_features(*decode_flac(p)) for p in payloads]
    assert media_features(payloads[0]) == expected[0]

    df = spark.createDataFrame(
        [(i, "audio", bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in extract_media_features(df, deterministic_fake=False).collect()
    }
    for i, exp in enumerate(expected):
        assert rows[i]["features"] == pytest.approx(exp, abs=1e-6)
        assert rows[i]["n_bytes"] == len(payloads[i])
