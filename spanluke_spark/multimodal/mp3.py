"""MP3 (MPEG-1/2/2.5 audio) frame-level probe — duration, bitrate,
sample rate, channel mode, VBR detection — WITHOUT PCM decode.

Scope is deliberate and honest: full Layer III PCM decode requires the
ISO 11172-3 Huffman code tables, which cannot be re-derived from first
principles (they are large arbitrary data blobs), so transcribing them
from memory in this sandbox would risk a silently-wrong decoder. The
frame HEADER format, by contrast, is small and fully public (sync,
version/layer bits, the 16-entry bitrate tables, 3-entry sample-rate
tables, padding/frame-size arithmetic), so a crawl pipeline can still
extract the features that matter for curation — duration, bitrate
histogram, VBR-ness, truncation detection — natively. PCM decode stays
behind the documented PIL/ffmpeg gate (`multimodal/codecs.py`).

Walks every frame (ID3v2 skipped via its syncsafe size, ID3v1 trailer
tolerated); any malformed/truncated frame raises ValueError per the
repo-wide codec contract — a torn download is detected, not guessed at.
"""

from __future__ import annotations

import struct

# bitrate tables in kbps, index 1..14 (0 = free-format: rejected; 15 invalid)
_BITRATES = {
    # (version_group, layer): MPEG1 vs MPEG2/2.5 share tables per layer
    (1, 1): [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}
_LAYERS = {1: 3, 2: 2, 3: 1}  # header bits -> layer number


def _frame_info(hdr: int) -> tuple[int, int, int, int]:
    """32-bit header -> (frame_bytes, samples, sample_rate, bitrate_kbps).
    Raises ValueError on anything malformed."""
    if hdr >> 21 != 0x7FF:
        raise ValueError("lost MP3 frame sync")
    ver_bits = (hdr >> 19) & 3
    if ver_bits == 1:
        raise ValueError("reserved MPEG version")
    layer_bits = (hdr >> 17) & 3
    if layer_bits == 0:
        raise ValueError("reserved MPEG layer")
    layer = _LAYERS[layer_bits]
    br_idx = (hdr >> 12) & 0xF
    if br_idx in (0, 15):
        raise ValueError("free-format/invalid bitrate index")
    sr_idx = (hdr >> 10) & 3
    if sr_idx == 3:
        raise ValueError("reserved sample rate")
    group = 1 if ver_bits == 3 else 2
    kbps = _BITRATES[(group, layer)][br_idx]
    rate = _RATES[ver_bits][sr_idx]
    padding = (hdr >> 9) & 1
    if layer == 1:
        size = (12 * kbps * 1000 // rate + padding) * 4
        samples = 384
    else:
        samples = 1152 if (layer == 2 or group == 1) else 576
        factor = samples // 8
        size = factor * kbps * 1000 // rate + padding
    return size, samples, rate, kbps


def mp3_probe(payload: bytes) -> dict:
    """Walk every frame -> {duration_s, n_frames, sample_rate, channels,
    avg_bitrate_kbps, vbr, layer, mpeg_version}. ValueError on malformed
    or truncated streams (incl. a torn final frame)."""
    i, n = 0, len(payload)
    if payload[:3] == b"ID3":
        if n < 10:
            raise ValueError("truncated ID3v2 header")
        sz = 0
        for b in payload[6:10]:
            if b & 0x80:
                raise ValueError("non-syncsafe ID3v2 size")
            sz = (sz << 7) | b
        i = 10 + sz
    if n >= 128 and payload[-128:-125] == b"TAG":
        n -= 128
    frames = 0
    dur = 0.0
    kbps_seen = set()
    kbps_sum = 0
    rate0 = channels = layer0 = ver0 = None
    while i < n:
        if i + 4 > n:
            raise ValueError("truncated MP3 frame header")
        hdr = struct.unpack_from(">I", payload, i)[0]
        size, samples, rate, kbps = _frame_info(hdr)
        if i + size > n:
            raise ValueError("truncated final MP3 frame")
        if frames == 0:
            ver_bits = (hdr >> 19) & 3
            ver0 = {3: "1", 2: "2", 0: "2.5"}[ver_bits]
            layer0 = _LAYERS[(hdr >> 17) & 3]
            rate0 = rate
            channels = 1 if ((hdr >> 6) & 3) == 3 else 2
        elif rate != rate0:
            raise ValueError("sample-rate change mid-stream")
        frames += 1
        dur += samples / rate
        kbps_seen.add(kbps)
        kbps_sum += kbps
        i += size
    if frames == 0:
        raise ValueError("no MP3 frames found")
    return {
        "duration_s": dur,
        "n_frames": frames,
        "sample_rate": rate0,
        "channels": channels,
        "avg_bitrate_kbps": kbps_sum / frames,
        "vbr": len(kbps_seen) > 1,
        "layer": layer0,
        "mpeg_version": ver0,
    }


def mp3_features(payload: bytes, dim: int = 16) -> list[float]:
    """Fixed-dim crawl features from the frame walk (duration, channels,
    rate, bitrate, vbr flag, frame count, layer) — the parse-only analogue
    of ``audio_features``; PCM-derived slots stay 0."""
    p = mp3_probe(payload)
    out = [
        float(p["duration_s"]),
        float(p["channels"]),
        float(p["sample_rate"]),
        float(p["avg_bitrate_kbps"]),
        1.0 if p["vbr"] else 0.0,
        float(p["n_frames"]),
        float(p["layer"]),
    ]
    out = out[:dim]
    return out + [0.0] * (dim - len(out))


def encode_mp3_fixture(
    duration_s: float = 1.0,
    rate: int = 44100,
    kbps: int = 128,
    channels: int = 2,
    vbr_alt_kbps: int | None = None,
    id3: bool = False,
) -> bytes:
    """Structurally-valid MPEG-1 Layer III stream for parser fixtures:
    correct headers + frame-size arithmetic, zero-filled frame bodies
    (this tests the PROBE; the audio payload is out of native scope)."""
    br_table = _BITRATES[(1, 3)]
    out = bytearray()
    if id3:
        tag_body = b"\x00" * 37
        out += b"ID3\x04\x00\x00" + bytes(
            (len(tag_body) >> s) & 0x7F for s in (21, 14, 7, 0)
        ) + tag_body
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[rate]
    n_frames = max(1, round(duration_s * rate / 1152))
    for f in range(n_frames):
        k = kbps if (vbr_alt_kbps is None or f % 2 == 0) else vbr_alt_kbps
        br_idx = br_table.index(k)
        mode = 3 if channels == 1 else 0
        hdr = (
            (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16)  # MPEG1 LIII, no CRC
            | (br_idx << 12) | (sr_idx << 10) | (mode << 6)
        )
        size = 144 * k * 1000 // rate
        out += struct.pack(">I", hdr) + b"\x00" * (size - 4)
    return bytes(out)
