"""REAL image codecs with zero library dependencies: PPM (P6) and BMP
(24-bit uncompressed) are plain headers over raw pixels, decodable with
numpy alone — so the multimodal decode step is genuinely real for these
formats even in this codec-less container. Compressed formats (JPEG/PNG)
dispatch to PIL when it exists and raise the documented NotImplementedError
otherwise; the magic-byte dispatch is the production seam.

All arrays are HxWx3 uint8 RGB.
"""

from __future__ import annotations

import struct

import numpy as np


def _ppm_header_tokens(payload: bytes, n: int) -> tuple[list[bytes], int]:
    """First ``n`` whitespace-separated header tokens ('#' comments skipped),
    plus the offset of the byte AFTER the single whitespace that terminates
    the last token (where raster data begins)."""
    toks: list[bytes] = []
    i = 0
    while len(toks) < n:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if i < len(payload) and payload[i : i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PPM header")
        toks.append(payload[i:j])
        i = j
    return toks, i + 1  # exactly one whitespace byte terminates the header


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6), maxval <= 255 -> HxWx3 uint8 RGB."""
    toks, off = _ppm_header_tokens(payload, 4)
    if toks[0] != b"P6":
        raise ValueError(f"not a P6 PPM: {toks[0]!r}")
    w, h, maxval = int(toks[1]), int(toks[2]), int(toks[3])
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    raster = payload[off : off + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3).copy()


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        arr.astype(np.uint8)
    ).tobytes()


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER) -> HxWx3 uint8 RGB.
    Handles 4-byte row padding and both bottom-up (positive height, the
    default) and top-down (negative height) orientations."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp})")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) // 4 * 4
    need = row_bytes * h
    raster = payload[data_off : data_off + need]
    if len(raster) < need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)[:, : w * 3]
    img = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if bottom_up else img).copy()


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit bottom-up BMP — for fixtures/round-trip tests."""
    h, w = arr.shape[:2]
    row_bytes = (w * 3 + 3) // 4 * 4
    raster = np.zeros((h, row_bytes), dtype=np.uint8)
    raster[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data = raster.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + data


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: PPM/BMP decode natively (numpy only); anything
    else tries PIL and raises the documented NotImplementedError when no
    codec library is shipped."""
    if payload[:2] == b"P6":
        return decode_ppm(payload)
    if payload[:2] == b"BM":
        return decode_bmp(payload)
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "payload is not PPM/BMP and no codec library (PIL) is available "
            "in this environment; deploy with the codec wheel"
        ) from exc
    return np.asarray(Image.open(io.BytesIO(payload)).convert("RGB"))


def resize_nearest(arr: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resample (pure index arithmetic —
    identical on every worker, no interpolation-library variance)."""
    h, w = arr.shape[:2]
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return arr[ys][:, xs]


def image_features(arr: np.ndarray, dim: int = 16) -> list[float]:
    """Real pixel features, fixed ``dim``: per-channel mean and std (6),
    luminance mean/std (2), then an 8-bin luminance histogram — padded or
    truncated to ``dim``. All float in [0, 1]."""
    f = arr.astype(np.float64) / 255.0
    lum = 0.2126 * f[:, :, 0] + 0.7152 * f[:, :, 1] + 0.0722 * f[:, :, 2]
    out = [
        *(float(f[:, :, c].mean()) for c in range(3)),
        *(float(f[:, :, c].std()) for c in range(3)),
        float(lum.mean()),
        float(lum.std()),
    ]
    hist, _ = np.histogram(lum, bins=8, range=(0.0, 1.0))
    out.extend((hist / max(lum.size, 1)).tolist())
    out = out[:dim]
    return out + [0.0] * (dim - len(out))
