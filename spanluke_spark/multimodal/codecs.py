"""REAL media codecs with zero library dependencies: PPM (P6), BMP (24-bit
uncompressed) and WAV (PCM) are plain headers over raw samples; PNG decodes
via stdlib zlib + per-scanline unfilter; baseline JPEG decodes via the full
public pipeline (Huffman entropy decode, dequantize, IDCT, chroma
upsample — ``multimodal/jpeg.py``). So the multimodal decode step is
genuinely real for the dominant web image formats even in this codec-less
container. Remaining compressed formats (WebP, MP3, ...)
dispatch to PIL/etc. when installed and raise the documented
NotImplementedError otherwise; the magic-byte dispatch (``media_features``)
is the production seam.

Image arrays are HxWx3 uint8 RGB; audio is (frames, channels) float64 in
[-1, 1].
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
    if not (0 < w and 0 < h) or w * h > MAX_PIXELS:
        raise ValueError(f"PPM dimensions {w}x{h} outside sane bounds")
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
    if not (0 < w and 0 < h) or w * h > MAX_PIXELS:
        raise ValueError(f"BMP dimensions {w}x{h} outside sane bounds")
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


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

MAX_PIXELS = 1 << 24  # 16.7 MP: allocation guard against corrupt headers

# non-ValueError exceptions a corrupt payload can trip inside a codec;
# decode_image/media_features convert them so a crawl job sees exactly one
# failure type per bad record (zlib.error is added at the catch sites)
_CODEC_ERRORS = (struct.error, IndexError, KeyError, OverflowError, MemoryError)


def _png_chunks(payload: bytes):
    i = 8
    while i + 8 <= len(payload):
        size = struct.unpack_from(">I", payload, i)[0]
        cid = payload[i + 4 : i + 8]
        yield cid, payload[i + 8 : i + 8 + size]
        i += 12 + size  # len + id + data + crc
        if cid == b"IEND":
            break


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Per-scanline unfilter (PNG spec §9): each row leads with a filter
    byte 0-4. None/Sub/Up vectorize (Sub is a per-lane cumsum); Average and
    Paeth carry an in-row left dependency, so those rows fall back to a
    byte loop — encoders choose filters per row, and the common rows stay
    on the fast path."""
    rows = raw.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int32)
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub: recon[i] = cur[i] + recon[i-bpp] -> lane cumsum
            rec = cur.copy()
            for lane in range(bpp):
                rec[lane::bpp] = np.cumsum(cur[lane::bpp]) % 256
        elif ft == 2:  # Up
            rec = (cur + prev) % 256
        elif ft in (3, 4):  # Average / Paeth: sequential left dependency
            rec = np.zeros(stride, dtype=np.int32)
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = int(rec[i - bpp]) if i >= bpp else 0
                b = int(pv[i])
                if ft == 3:
                    rec[i] = (cur[i] + (a + b) // 2) % 256
                else:
                    c = int(pv[i - bpp]) if i >= bpp else 0
                    rec[i] = (cur[i] + _paeth(a, b, c)) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = rec.astype(np.uint8)
        prev = out[y]
    return out


def _unpack_subbyte(row_bytes: np.ndarray, depth: int, w: int) -> np.ndarray:
    """1/2/4-bit samples (big-endian within each byte) -> one value per
    pixel, first ``w`` kept (rows are padded to whole bytes)."""
    bits = np.unpackbits(row_bytes, axis=1)
    per = bits.reshape(row_bytes.shape[0], -1, depth)
    weights = 1 << np.arange(depth - 1, -1, -1)
    return (per * weights).sum(axis=2)[:, :w]


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _decode_png_pass(
    raw: np.ndarray, off: int, w_p: int, h_p: int, channels: int, depth: int
) -> tuple[np.ndarray, int]:
    """One (sub-)image of filtered scanlines starting at ``off`` ->
    ((h_p, w_p, channels) uint8 samples, next offset). 16-bit samples are
    reduced to their high byte (the standard 8-bit approximation)."""
    stride = (w_p * channels * depth + 7) // 8
    bpp = max(1, channels * depth // 8)
    need = h_p * (stride + 1)
    chunk = raw[off : off + need]
    if chunk.size != need:
        raise ValueError("PNG raster size mismatch")
    rows = _png_unfilter(chunk, h_p, stride, bpp)
    if depth < 8:
        samples = _unpack_subbyte(rows, depth, w_p)[:, :, None].astype(np.uint8)
    elif depth == 8:
        samples = rows.reshape(h_p, w_p, channels)
    else:  # 16-bit big-endian: high byte
        samples = rows.reshape(h_p, w_p, channels, 2)[:, :, :, 0]
    return samples, off + need


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8 RGB, pure stdlib-zlib + numpy (no PIL).

    Supported: bit depths 1/2/4/8/16 (16-bit reduced to the high byte),
    color types 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA) —
    alpha is dropped, not composited — and both interlace methods (none and
    Adam7, decoded pass-by-pass into the output grid)."""
    import zlib

    if payload[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    ihdr = None
    plte = None
    idat = bytearray()
    for cid, body in _png_chunks(payload):
        if cid == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif cid == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif cid == b"IDAT":
            idat.extend(body)
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if not (0 < w and 0 < h) or w * h > MAX_PIXELS:
        raise ValueError(f"PNG dimensions {w}x{h} outside sane bounds")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"bad PNG color type {ctype}")
    if depth not in (1, 2, 4, 8, 16) or (depth < 8 and ctype in (2, 4, 6)):
        raise ValueError(f"unsupported PNG bit depth {depth} for color type {ctype}")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace == 0:
        samples, _ = _decode_png_pass(raw, 0, w, h, channels, depth)
    else:
        samples = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            w_p = (w - x0 + dx - 1) // dx
            h_p = (h - y0 + dy - 1) // dy
            if w_p <= 0 or h_p <= 0:
                continue
            sub, off = _decode_png_pass(raw, off, w_p, h_p, channels, depth)
            samples[y0::dy, x0::dx] = sub
    if channels == 1:
        samples = samples[:, :, 0]  # (h, w) for the ctype 0/3 paths below
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[samples].copy()
    if ctype == 0:
        scale = 255 // ((1 << depth) - 1) if depth < 8 else 1
        g = (samples * scale).astype(np.uint8)
        return np.repeat(g[:, :, None], 3, axis=2)
    if ctype == 4:
        g = samples[:, :, 0]
        return np.repeat(g[:, :, None], 3, axis=2).copy()
    return samples[:, :, :3].copy()  # ctype 2 or 6


def encode_png(arr: np.ndarray, filter_type: int = 0, level: int = 6) -> bytes:
    """8-bit RGB PNG encoder (single IDAT). ``filter_type`` applies one
    filter (0-4) to every scanline — besides producing fixtures, this lets
    tests drive every decode unfilter path."""
    import zlib

    arr = np.ascontiguousarray(arr.astype(np.uint8))
    h, w = arr.shape[:2]
    flat = arr.reshape(h, w * 3).astype(np.int32)
    prev = np.zeros(w * 3, dtype=np.int32)
    body = bytearray()
    for y in range(h):
        cur = flat[y]
        left = np.concatenate([np.zeros(3, dtype=np.int32), cur[:-3]])
        upleft = np.concatenate([np.zeros(3, dtype=np.int32), prev[:-3]])
        if filter_type == 0:
            out = cur
        elif filter_type == 1:
            out = cur - left
        elif filter_type == 2:
            out = cur - prev
        elif filter_type == 3:
            out = cur - (left + prev) // 2
        elif filter_type == 4:
            out = cur.copy()
            for i in range(w * 3):
                out[i] = cur[i] - _paeth(int(left[i]), int(prev[i]), int(upleft[i]))
        else:
            raise ValueError(f"bad filter type {filter_type}")
        body.append(filter_type)
        body.extend((out % 256).astype(np.uint8).tobytes())
        prev = cur

    def chunk(cid: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + cid + data
            + struct.pack(">I", zlib.crc32(cid + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(body), level))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Magic-byte dispatch: PPM/BMP/PNG/GIF/JPEG/lossless-WebP decode
    natively (numpy + stdlib zlib only); anything else (lossy WebP,
    CMYK/12-bit JPEG, ...) tries PIL and raises the documented
    NotImplementedError when no codec library is shipped."""
    import zlib

    try:
        if payload[:2] == b"P6":
            return decode_ppm(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:8] == PNG_MAGIC:
            return decode_png(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            from .gif import decode_gif

            return decode_gif(payload)
    except (*_CODEC_ERRORS, zlib.error) as exc:
        raise ValueError(f"corrupt image payload: {type(exc).__name__}: {exc}") from exc
    if payload[:2] == b"\xff\xd8":
        from .jpeg import UnsupportedJpegError, decode_jpeg

        try:
            return decode_jpeg(payload)
        except UnsupportedJpegError:
            # well-formed but outside the native scope (12-bit, CMYK, ...):
            # fall through to the PIL path / documented gate below
            pass
        # plain ValueError = corruption: propagate, honoring the
        # "corrupt payloads of any kind raise ValueError" contract
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        from .webp import UnsupportedWebpError, decode_webp

        try:
            return decode_webp(payload)
        except UnsupportedWebpError:
            # lossy VP8 / animation: valid but outside native scope
            pass
    try:
        import io

        from PIL import Image  # noqa: PLC0415
    except ImportError as exc:
        raise NotImplementedError(
            "payload is not PPM/BMP/PNG and no codec library (PIL) is "
            "available in this environment; deploy with the codec wheel"
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


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE with uncompressed PCM (8/16/32-bit int) -> (sample_rate,
    samples as float64 in [-1, 1], shape (n_frames, n_channels)). Pure
    struct/numpy — no audio library required."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    i, n = 12, len(payload)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        body = payload[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, channels, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_format != 1:
        raise ValueError(f"only PCM WAV supported (format={audio_format})")
    if bits == 8:  # unsigned
        a = (np.frombuffer(data, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        a = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        a = np.frombuffer(data, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    frames = len(a) // channels
    return rate, a[: frames * channels].reshape(frames, channels)


def encode_wav(rate: int, samples: np.ndarray) -> bytes:
    """16-bit PCM encoder — for fixtures/round-trip tests."""
    if samples.ndim == 1:
        samples = samples[:, None]
    pcm = np.clip(samples, -1.0, 1.0 - 1.0 / 32768)
    data = (pcm * 32768.0).astype("<i2").tobytes()
    ch = samples.shape[1]
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    return (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )


def audio_features(rate: int, samples: np.ndarray, dim: int = 16) -> list[float]:
    """Real signal features, fixed ``dim``: duration (s), n_channels, RMS,
    peak, zero-crossing rate (first channel), then an 8-bin |amplitude|
    histogram — padded/truncated to ``dim``."""
    mono = samples[:, 0] if samples.size else np.zeros(1)
    zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if len(mono) > 1 else 0.0
    out = [
        float(len(samples) / rate) if rate else 0.0,
        float(samples.shape[1] if samples.ndim == 2 else 1),
        float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0,
        float(np.max(np.abs(samples))) if samples.size else 0.0,
        zc,
    ]
    hist, _ = np.histogram(np.abs(mono), bins=8, range=(0.0, 1.0))
    out.extend((hist / max(len(mono), 1)).tolist())
    out = out[:dim]
    return out + [0.0] * (dim - len(out))


def media_features(payload: bytes, dim: int = 16) -> list[float]:
    """Kind dispatch by magic bytes: RIFF/WAVE -> real audio features,
    else the image path (PPM/BMP/PNG/baseline-JPEG native, PIL-gated
    otherwise). Corrupt payloads of any kind raise ValueError."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        try:
            rate, samples = decode_wav(payload)
        except _CODEC_ERRORS as exc:
            raise ValueError(
                f"corrupt WAV payload: {type(exc).__name__}: {exc}"
            ) from exc
        return audio_features(rate, samples, dim)
    if payload[:3] == b"ID3" or (
        len(payload) >= 2 and payload[0] == 0xFF and payload[1] & 0xE0 == 0xE0
    ):
        # MP3: frame-walk probe features (duration/bitrate/VBR) — native;
        # PCM decode stays gated (multimodal/mp3.py docstring)
        from .mp3 import mp3_features

        try:
            return mp3_features(payload, dim)
        except _CODEC_ERRORS as exc:
            raise ValueError(
                f"corrupt MP3 payload: {type(exc).__name__}: {exc}"
            ) from exc
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        try:
            rate, samples = decode_flac(payload)
        except _CODEC_ERRORS as exc:
            raise ValueError(
                f"corrupt FLAC payload: {type(exc).__name__}: {exc}"
            ) from exc
        return audio_features(rate, samples, dim)
    return image_features(decode_image(payload), dim)
