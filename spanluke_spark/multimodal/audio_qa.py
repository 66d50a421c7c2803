"""Audio quality screening over WAV payloads — the audio twin of the
image feature lane (multimodal/media.py): loudness (RMS), peak level,
and clipping ratio per payload, the three gates an audio-crawl curation
pipeline applies before anything expensive (silence/clipped captures are
dropped; loudness feeds normalization).

Distributed shape: one mapInPandas stage over Arrow batches — payloads
never materialize as Spark rows beyond the batch, decoding uses the
in-repo pure-numpy RIFF/WAVE decoder (multimodal/codecs.decode_wav), no
audio library. Statistics are integer-exact: decoded float samples are
the dyadic rationals s/32768, recovered to int16 via rint, so sum of
squares / peak / clip counts are exact integers in any order — the
oracle can replay them from the generative formula without decoding,
which makes the driver row a distributed ENCODE->DECODE ROUND-TRIP
gate, not just a feature check. Corrupt payloads follow the crawl
policy of media.py: on_error='null' emits a (-1, NULL...) marker row,
'raise' propagates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["audio_qa_features"]

_SCHEMA = (
    "media_id long, n_samples long, peak int, sum_sq long, "
    "clip_ratio double, rms double"
)


def audio_qa_features(
    media: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    clip_thresh: int = 950,
    on_error: str = "null",
) -> DataFrame:
    """(media_id, payload: binary WAV) -> (media_id, n_samples, peak,
    sum_sq, clip_ratio, rms). peak/sum_sq are exact int16-domain
    integers; rms = sqrt(sum_sq / n) and clip_ratio = clipped / n are
    the only floats (single expressions over exact ints)."""
    if on_error not in ("null", "raise"):
        raise ValueError("on_error must be 'null' or 'raise'")

    def _extract(batches):
        import math
        from struct import error as struct_error

        import numpy as np
        import pandas as pd

        from spanluke_spark.multimodal.codecs import decode_wav

        def r6(x):
            # half-AWAY-from-zero, matching SQL round(): clip ratios are
            # dyadic (n is a power of two in fixtures), so exact ...5
            # ties at the 7th decimal genuinely occur and Python's
            # banker's round() would disagree with the oracle
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "n_samples", "peak", "sum_sq", "clip_ratio", "rms"
            )}
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _rate, samples = decode_wav(bytes(payload))
                    ints = np.rint(samples[:, 0] * 32768.0).astype(np.int64)
                    n = int(ints.shape[0])
                    if n == 0:
                        raise ValueError("empty WAV data chunk")
                    sum_sq = int(np.sum(ints * ints))
                    peak = int(np.max(np.abs(ints)))
                    clipped = int(np.sum(np.abs(ints) > clip_thresh))
                    out["media_id"].append(int(mid))
                    out["n_samples"].append(n)
                    out["peak"].append(peak)
                    out["sum_sq"].append(sum_sq)
                    out["clip_ratio"].append(r6(clipped / n))
                    out["rms"].append(r6(math.sqrt(sum_sq / n)))
                except (ValueError, IndexError, struct_error):
                    if on_error == "raise":
                        raise
                    out["media_id"].append(int(mid))
                    out["n_samples"].append(-1)
                    out["peak"].append(None)
                    out["sum_sq"].append(None)
                    out["clip_ratio"].append(None)
                    out["rms"].append(None)
            yield pd.DataFrame(out)

    return media.select(
        F.col(id_col).alias(id_col), F.col(payload_col).alias(payload_col)
    ).mapInPandas(_extract, _SCHEMA)
