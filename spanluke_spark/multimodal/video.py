"""Motion-JPEG AVI: the one video format this container can decode for
REAL with zero libraries — RIFF/AVI is a plain chunk container (public
format, same RIFF grammar as WAV) and each frame is a baseline JPEG, which
``multimodal/jpeg.py`` already decodes. This closes the video gap from
"frame-sampling plan + stubbed decode" to an end-to-end pipeline: container
parse -> frame selection -> real pixel decode -> features, all inside the
same mapInPandas batch seam as images/audio.

Other video codecs (H.264/VP9/...) remain behind the documented
ffmpeg/PyAV gate in ``media.py`` — a codec wheel swaps in behind the same
functions without touching Spark plumbing.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np

from .codecs import _CODEC_ERRORS


def _chunks(buf: bytes, start: int, end: int):
    """Iterate RIFF (fourcc, body_start, body_size) within [start, end)."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i : i + 4]
        size = struct.unpack_from("<I", buf, i + 4)[0]
        yield fourcc, i + 8, size
        i += 8 + size + (size & 1)  # chunks are word-aligned


def decode_mjpeg_avi(payload: bytes) -> tuple[float, list[bytes]]:
    """MJPEG AVI bytes -> (fps, [jpeg frame bytes]).

    Walks the RIFF tree: ``avih`` gives the frame interval; video frames
    are the ``##dc``/``##db`` chunks of the ``movi`` list (any stream id —
    single-video-stream files, the MJPEG norm). Corrupt containers raise
    ValueError like every other codec here."""
    try:
        if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
            raise ValueError("not a RIFF/AVI payload")
        fps = 0.0
        frames: list[bytes] = []

        def walk(start: int, end: int) -> None:
            nonlocal fps
            for fourcc, body, size in _chunks(payload, start, end):
                if fourcc == b"LIST":
                    walk(body + 4, body + size)  # skip the list-type fourcc
                elif fourcc == b"avih":
                    us_per_frame = struct.unpack_from("<I", payload, body)[0]
                    if us_per_frame:
                        fps = 1e6 / us_per_frame
                elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                    frames.append(payload[body : body + size])

        walk(12, len(payload))
        if not frames:
            raise ValueError("AVI contains no video frames")
        return fps, frames
    except _CODEC_ERRORS as exc:
        raise ValueError(f"corrupt AVI payload: {type(exc).__name__}: {exc}") from exc


def encode_mjpeg_avi(jpeg_frames: list[bytes], fps: float = 10.0) -> bytes:
    """Minimal single-stream MJPEG AVI writer — fixtures/round-trip tests
    (the same role as encode_bmp/encode_wav)."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")
    us_per_frame = int(round(1e6 / fps))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack(
        "<14I", us_per_frame, 0, 0, 0x10, len(jpeg_frames), 0, 1, 0, 0, 0, 0, 0, 0, 0
    )
    strh = b"vids" + b"MJPG" + struct.pack("<10I4H", 0, 0, 0, 1, int(round(fps)), 0,
                                           len(jpeg_frames), 0, 0xFFFFFFFF, 0, 0, 0, 0, 0)
    strf = struct.pack("<IiiHH4sIiiII", 40, 0, 0, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def sample_frame_indices(n_frames: int, fps: float, every_ms: int) -> list[tuple[int, int]]:
    """(frame_idx, ts_ms) at ~every_ms spacing — frame 0 always included;
    mirrors ``frame_sample_plan``'s relational arithmetic."""
    if n_frames <= 0:
        return []
    if fps <= 0:
        return [(0, 0)]
    step = max(1, int(round(every_ms * fps / 1000.0)))
    return [(i, int(round(i * 1000.0 / fps))) for i in range(0, n_frames, step)]


def extract_video_frame_features(
    media,
    every_ms: int = 1000,
    dim: int = 16,
    on_error: str = "raise",
):
    """(media with MJPEG-AVI payloads) -> (media_id, frame_idx, ts_ms,
    features: array<float>) — REAL end-to-end: container parse, frame
    sampling at ``every_ms``, baseline-JPEG pixel decode, pixel features;
    one mapInPandas hop, frames of one video never cross partitions.
    ``on_error='null'`` emits a single NULL-features row per undecodable
    video instead of failing the job (same crawl policy as
    ``extract_media_features``)."""
    import pandas as pd

    from .codecs import image_features
    from .jpeg import decode_jpeg

    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    schema = "media_id long, frame_idx int, ts_ms long, features array<float>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "ts_ms": [], "features": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # buffer the video's rows locally and commit atomically:
                # a frame failing mid-video must yield ONLY the marker row,
                # never partial real rows + a marker (double-count)
                rows: list[tuple[int, int, object]] = []
                try:
                    if payload is None:
                        raise ValueError("NULL payload has no decodable video")
                    fps, frames = decode_mjpeg_avi(bytes(payload))
                    for idx, ts in sample_frame_indices(len(frames), fps, every_ms):
                        rows.append((idx, ts, image_features(decode_jpeg(frames[idx]), dim)))
                except ValueError:
                    if on_error == "raise":
                        raise
                    rows = [(-1, -1, None)]
                for idx, ts, feats in rows:
                    out["media_id"].append(mid)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    out["features"].append(feats)
            yield pd.DataFrame(out)

    from pyspark.sql import functions as F

    return (
        media.filter(F.col("kind") == "video")
        .select("media_id", "payload")
        .repartition(F.col("media_id"))
        .mapInPandas(_extract, schema)
    )
