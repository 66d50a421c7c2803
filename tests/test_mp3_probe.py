"""MP3 frame-probe gates (multimodal/mp3.py): hand-computed header
arithmetic, CBR/VBR/ID3/mono fixtures, truncation + corruption ->
ValueError, fuzz sweep, and the media_features dispatch (incl. the
Spark kernel path).
"""

import struct

import numpy as np
import pytest

from spanluke_spark.multimodal.mp3 import (
    _frame_info,
    encode_mp3_fixture,
    mp3_features,
    mp3_probe,
)


def test_frame_info_hand_computed():
    # MPEG1 Layer III, 128 kbps, 44100 Hz, no padding, stereo:
    # size = 144 * 128000 / 44100 = 417 (floor), 1152 samples
    hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | (9 << 12) | (0 << 10)
    assert _frame_info(hdr) == (417, 1152, 44100, 128)
    # same with padding bit -> 418
    assert _frame_info(hdr | (1 << 9))[0] == 418
    # MPEG2 Layer III, 64 kbps, 24000 Hz: 72 * 64000/24000 = 192, 576 samples
    hdr2 = (0x7FF << 21) | (2 << 19) | (1 << 17) | (1 << 16) | (8 << 12) | (1 << 10)
    assert _frame_info(hdr2) == (192, 576, 24000, 64)
    # MPEG1 Layer I, 224 kbps, 32000 Hz: (12*224000/32000 + 0)*4 = 336, 384
    hdr3 = (0x7FF << 21) | (3 << 19) | (3 << 17) | (1 << 16) | (7 << 12) | (2 << 10)
    assert _frame_info(hdr3) == (336, 384, 32000, 224)


def test_probe_cbr_stereo():
    p = encode_mp3_fixture(duration_s=2.0, rate=44100, kbps=128)
    info = mp3_probe(p)
    assert info["sample_rate"] == 44100 and info["channels"] == 2
    assert info["layer"] == 3 and info["mpeg_version"] == "1"
    assert not info["vbr"] and info["avg_bitrate_kbps"] == 128
    assert info["duration_s"] == pytest.approx(2.0, abs=0.05)
    assert info["n_frames"] == round(2.0 * 44100 / 1152)


def test_probe_vbr_id3_mono():
    p = encode_mp3_fixture(
        duration_s=1.0, rate=32000, kbps=96, channels=1,
        vbr_alt_kbps=160, id3=True,
    )
    info = mp3_probe(p)
    assert info["vbr"] and info["channels"] == 1 and info["sample_rate"] == 32000
    assert 96 < info["avg_bitrate_kbps"] < 160
    # ID3v1 trailer is tolerated
    info2 = mp3_probe(p + b"TAG" + b"\x00" * 125)
    assert info2["n_frames"] == info["n_frames"]


def test_truncation_and_corruption_raise():
    p = encode_mp3_fixture(duration_s=0.5)
    with pytest.raises(ValueError, match="truncated"):
        mp3_probe(p[:-10])  # torn final frame
    bad = bytearray(p)
    bad[0] = 0x00  # destroy first sync
    with pytest.raises(ValueError):
        mp3_probe(bytes(bad))
    with pytest.raises(ValueError, match="no MP3 frames"):
        mp3_probe(encode_mp3_fixture(duration_s=0.1)[:0] + b"ID3\x04\x00\x00\x00\x00\x00\x00")
    # free-format bitrate index rejected
    hdr = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | (0 << 12)
    with pytest.raises(ValueError):
        _frame_info(hdr)


def test_fuzz_uniform_valueerror():
    rng = np.random.default_rng(6)
    good = bytearray(encode_mp3_fixture(duration_s=0.3))
    for trial in range(300):
        bad = bytearray(good)
        if trial % 3 == 0:
            bad = bad[: rng.integers(1, len(bad))]
        else:
            for _ in range(rng.integers(1, 4)):
                bad[rng.integers(0, len(bad))] = rng.integers(0, 256)
        try:
            info = mp3_probe(bytes(bad))
            assert info["n_frames"] >= 1  # legal different parse
        except ValueError:
            pass  # the only allowed raise


def test_media_features_dispatch_and_kernel(spark):
    from spanluke_spark.multimodal.codecs import media_features
    from spanluke_spark.multimodal.media import extract_media_features

    payloads = [
        encode_mp3_fixture(duration_s=0.5 + 0.25 * i, kbps=128, id3=(i % 2 == 0))
        for i in range(3)
    ]
    expected = [mp3_features(p) for p in payloads]
    assert media_features(payloads[0]) == expected[0]
    assert expected[1][0] == pytest.approx(0.75, abs=0.05)  # duration slot

    df = spark.createDataFrame(
        [(i, "audio", bytearray(p)) for i, p in enumerate(payloads)],
        "media_id long, kind string, payload binary",
    )
    rows = {
        r["media_id"]: r
        for r in extract_media_features(df, deterministic_fake=False).collect()
    }
    for i, exp in enumerate(expected):
        assert rows[i]["features"] == pytest.approx(exp, abs=1e-4)
