"""Audio QA through the real WAV codec — closed-form anchors (silence,
full-scale square wave), driver-side decode parity, corrupt-payload
crawl policy (null marker vs raise), and the int16 round-trip exactness
the oracle relies on."""

from __future__ import annotations

import math

import numpy as np
import pytest

from spanluke_spark.multimodal.audio_qa import audio_qa_features
from spanluke_spark.multimodal.codecs import encode_wav


def _mk(spark, rows):
    return spark.createDataFrame(rows, "media_id: long, payload: binary")


def _run(spark, rows, **kw):
    out = audio_qa_features(_mk(spark, rows), **kw).collect()
    return {r["media_id"]: r for r in out}


def test_silence_and_square_wave_anchors(spark):
    silence = encode_wav(8000, np.zeros(100))
    square = encode_wav(8000, np.array([0.5, -0.5] * 50))  # +-16384
    got = _run(spark, [(1, silence), (2, square)])
    s = got[1]
    assert (s["n_samples"], s["peak"], s["sum_sq"], s["clip_ratio"], s["rms"]) == (
        100, 0, 0, 0.0, 0.0
    )
    q = got[2]
    assert q["n_samples"] == 100 and q["peak"] == 16384
    assert q["sum_sq"] == 100 * 16384 * 16384
    assert q["clip_ratio"] == 1.0  # every sample above the 950 threshold
    assert q["rms"] == pytest.approx(16384.0)


def test_matches_driver_side_decode(spark):
    rng = np.random.RandomState(3)
    rows = []
    want = {}
    for mid in range(5):
        ints = rng.randint(-2000, 2001, size=128)
        rows.append((mid, encode_wav(16000, ints / 32768.0)))
        sum_sq = int(np.sum(ints.astype(np.int64) ** 2))
        want[mid] = (
            128,
            int(np.max(np.abs(ints))),
            sum_sq,
            math.floor(int(np.sum(np.abs(ints) > 950)) / 128 * 1e6 + 0.5) / 1e6,
            math.floor(math.sqrt(sum_sq / 128) * 1e6 + 0.5) / 1e6,
        )
    got = _run(spark, rows)
    for mid, (n, peak, ss, cr, rms) in want.items():
        r = got[mid]
        assert (r["n_samples"], r["peak"], r["sum_sq"]) == (n, peak, ss)
        assert r["clip_ratio"] == cr and r["rms"] == rms


def test_corrupt_payload_null_marker(spark):
    ok = encode_wav(8000, np.zeros(10))
    got = _run(spark, [(1, ok), (2, b"not a wav"), (3, ok[:20])])
    assert got[1]["n_samples"] == 10
    for bad in (2, 3):
        r = got[bad]
        assert r["n_samples"] == -1 and r["rms"] is None and r["peak"] is None


def test_corrupt_payload_raise_policy(spark):
    with pytest.raises(Exception):
        _run(spark, [(1, b"garbage")], on_error="raise")


def test_clip_threshold_parameter(spark):
    wav = encode_wav(8000, np.array([100, -200, 300, 400]) / 32768.0)
    got = _run(spark, [(1, wav)], clip_thresh=250)
    assert got[1]["clip_ratio"] == 0.5  # |300|, |400| above 250
