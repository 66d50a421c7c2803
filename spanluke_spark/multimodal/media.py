"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, Arrow batch shape, UDF
signatures) is real and tested — and the decode step is REAL, pure-numpy,
for the dominant web formats: PPM, 24-bit BMP, PNG (incl. Adam7/16-bit),
baseline+progressive JPEG, GIF, lossless WebP, WAV/PCM + FLAC audio
(`multimodal/codecs.py`, `jpeg.py`, `gif.py`, `webp.py`, `flac.py`)
and MJPEG-AVI video (`multimodal/video.py` — container parse + frame
sample + per-frame JPEG pixel decode, end to end). MP3 is frame-probed natively
(duration/bitrate/VBR — multimodal/mp3.py); remaining formats
(lossy WebP, MP3 PCM, H.264/VP9...) dispatch to PIL/ffmpeg when
installed and raise a clearly-marked NotImplementedError otherwise;
`deterministic_fake=True` (default) keeps the hash-derived fake for
library-free fixtures of arbitrary formats.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),  # opaque bytes
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_DIM = 16


def _decode_image_real(payload: bytes) -> "object":
    """Production decode hook. REAL for PPM/BMP (pure-numpy codecs, no
    libraries needed — multimodal/codecs.py); other formats dispatch to PIL
    when installed and raise the documented NotImplementedError otherwise."""
    from .codecs import decode_image

    if payload is None:
        raise NotImplementedError("NULL payload has no decodable image")
    return decode_image(bytes(payload))


def _fake_features(payload: bytes | None, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake 'decoded features': blake2b-derived floats in [0,1).
    Stable across workers/runs — exercises the full Arrow path with realistic
    shapes while the codec is stubbed."""
    if payload is None:
        return [0.0] * dim
    out = []
    for i in range(dim):
        h = hashlib.blake2b(bytes(payload) + struct.pack("<I", i), digest_size=8).digest()
        out.append(struct.unpack("<Q", h)[0] / 2.0**64)
    return out


def extract_media_features(
    media: DataFrame,
    deterministic_fake: bool = True,
    dim: int = FEATURE_DIM,
    on_error: str = "raise",
) -> DataFrame:
    """(media) -> (media_id, kind, n_bytes, features: array<float>).

    mapInPandas over Arrow batches: binary payloads never materialize as Spark
    rows beyond this hop. Swap the fake for the real codec in production.

    ``on_error``: ``"raise"`` fails the task on the first undecodable payload
    (the strict default — right for tests and for surfacing a missing codec
    wheel); ``"null"`` emits NULL features for that record and keeps going —
    the crawl-scale policy, where a handful of corrupt images must not kill
    a 100 TB job (count failures with ``features IS NULL``).
    """
    if on_error not in ("raise", "null"):
        raise ValueError(f"on_error must be 'raise' or 'null', got {on_error!r}")
    schema = f"media_id long, kind string, n_bytes long, features array<float>"

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import media_features

        def real(payload):
            if payload is None:
                raise NotImplementedError("NULL payload has no decodable media")
            # REAL features for decodable payloads (PPM/BMP/PNG/baseline-JPEG
            # pixels + WAV/PCM audio native; PIL formats when installed);
            # undecodable bytes raise the documented error
            return media_features(bytes(payload), dim)

        for pdf in batches:
            feats, sizes = [], []
            for payload in pdf["payload"]:
                sizes.append(len(payload) if payload is not None else 0)
                if deterministic_fake:
                    feats.append(_fake_features(payload, dim))
                elif on_error == "null":
                    try:
                        feats.append(real(payload))
                    except (ValueError, NotImplementedError):
                        feats.append(None)
                else:
                    feats.append(real(payload))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": sizes,
                    "features": feats,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(_extract, schema)


def resize_media(
    media: DataFrame,
    max_w: int = 256,
    max_h: int = 256,
    deterministic_fake: bool = True,
) -> DataFrame:
    """Resize planning + (stubbed) pixel work, split the right way for scale:
    the TARGET-DIMENSION arithmetic (aspect-preserving fit into max_w x max_h,
    never upscaled) is pure JVM codegen — no bytes move for it — while the
    pixel resample itself is the per-batch codec step (deterministic fake
    here; the production codec swaps in behind the same signature).
    Output: media columns + (new_w, new_h, resized: binary)."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    dims = media.select(
        "media_id",
        "kind",
        "payload",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1)).cast("int").alias("new_w"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1)).cast("int").alias("new_h"),
    )
    schema = (
        "media_id long, kind string, width int, height int, "
        "new_w int, new_h int, resized binary"
    )

    def _resample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .codecs import encode_ppm, resize_nearest

        for pdf in batches:
            out = []
            for payload, w, h in zip(pdf["payload"], pdf["new_w"], pdf["new_h"]):
                if not deterministic_fake:
                    # REAL resample: decode (PPM/BMP native), deterministic
                    # nearest-neighbor, re-encode as PPM
                    arr = _decode_image_real(payload)
                    out.append(encode_ppm(resize_nearest(arr, int(w), int(h))))
                    continue
                # fake resample: first new_w*new_h bytes of a blake2b stream
                seed = (bytes(payload) if payload is not None else b"") + struct.pack(
                    "<II", int(w), int(h)
                )
                n = min(int(w) * int(h), 64)
                out.append(hashlib.blake2b(seed, digest_size=max(n, 1)).digest())
            res = pdf[["media_id", "kind", "width", "height", "new_w", "new_h"]].copy()
            res["resized"] = out
            yield res

    return dims.mapInPandas(_resample, schema)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms) —
    relational explode over the duration, no payload bytes touched. Shows
    the partitioning/batching story: frames of one video stay in one
    partition (hash on media_id). For MJPEG-AVI payloads the REAL
    plan+decode+features path is ``video.extract_video_frame_features``."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest((F.col("duration_ms") / every_ms).cast("long") - 1, F.lit(0)),
            )
        ).alias("frame_idx"),
    )
    return frames.withColumn("frame_ts_ms", F.col("frame_idx") * every_ms).repartition(
        F.col("media_id")
    )


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents fixture:
    payload = utf-8 text bytes; metadata derived from doc_id arithmetic."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.concat(F.lit("https://media.example.org/"), F.col("doc_id").cast("string")).alias("url"),
        kind.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.col("text").cast("binary").alias("payload"),
        (F.col("n_chars") % 640 + 1).cast("int").alias("width"),
        (F.col("n_chars") % 480 + 1).cast("int").alias("height"),
        (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
    )
