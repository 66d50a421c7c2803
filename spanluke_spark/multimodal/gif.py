"""GIF decoder in pure numpy + stdlib — the fourth common web image format
decoded natively (after BMP, PNG, baseline JPEG).

Everything is the public GIF89a specification: logical screen descriptor,
global/local color tables, sub-block chains, variable-width LZW decode
(clear/EOI codes, 12-bit cap), 4-pass interlacing. The decoder returns the
FIRST image frame as HxWx3 RGB (animation frames beyond the first and
transparency compositing are out of scope — ``decode_image`` routes to PIL
for those needs when a codec wheel ships).

The fixture encoder uses the classic "uncompressed GIF" technique: every
pixel is emitted as its own literal LZW code with a CLEAR before the code
width would grow — valid LZW any decoder accepts, trivially correct, and
round-trip exact for palette-indexed content.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block chain starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    out = bytearray()
    n = len(payload)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = payload[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        out.extend(payload[pos : pos + size])
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        pos += size


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW -> palette indices (int32 array, n_pixels).

    The dictionary is the standard linked-list representation —
    ``(prefix code, suffix symbol)`` per entry, strings materialized only
    at emission by walking the chain into a scratch buffer — so total work
    is linear in emitted pixels (a tuple-per-entry table copies its whole
    prefix on every insert: O(len^2) on deep dictionaries from real
    compressed streams)."""
    if not (2 <= min_code_size <= 11):
        # spec range is 2..8; codes cap at 12 bits regardless. A corrupt
        # byte here (up to 255) would otherwise size the literal table at
        # 2^255 entries — a hang, not an error.
        raise ValueError(f"bad GIF LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: LSB-first within bytes (GIF packs codes little-endian)
    acc = 0
    nbits = 0
    di = 0
    dlen = len(data)

    out = np.empty(n_pixels, dtype=np.int32)
    n_out = 0

    MAXCODES = 4096
    prefix = [-1] * MAXCODES  # -1 terminates a chain
    suffix = [0] * MAXCODES
    first = [0] * MAXCODES  # first symbol of the entry's string
    for i in range(clear):
        suffix[i] = i
        first[i] = i
    width = min_code_size + 1
    next_code = eoi + 1
    prev = -1
    buf = [0] * MAXCODES  # chain-walk scratch (max chain length < 4096)
    while n_out < n_pixels:
        while nbits < width:
            if di >= dlen:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            width = min_code_size + 1
            next_code = eoi + 1
            prev = -1
            continue
        if code == eoi:
            break
        if code == next_code and prev != -1 and next_code < MAXCODES:
            # KwKwK: the code being decoded IS the entry about to be added
            # (prev's string + prev's first symbol) — add it first, then the
            # normal chain-walk emission below resolves it
            prefix[next_code] = prev
            suffix[next_code] = first[prev]
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
            added = True
        elif code < next_code:
            added = False
        else:
            raise ValueError("corrupt GIF LZW code")
        # materialize the code's string: reversed chain walk, then unreverse
        k = 0
        c = code
        while c != -1:
            buf[k] = suffix[c]
            k += 1
            c = prefix[c]
        take = min(k, n_pixels - n_out)
        out[n_out : n_out + take] = buf[k - 1 :: -1][:take]
        n_out += take
        if not added and prev != -1 and next_code < MAXCODES:
            # normal case: new entry = prev's string + this string's first
            prefix[next_code] = prev
            suffix[next_code] = first[code]
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < n_pixels:
        raise ValueError("GIF LZW stream ended early")
    return out


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """GIF bytes -> HxWx3 uint8 RGB (first frame; frame placed on its
    logical-screen position over the background color). Corrupt input
    surfaces as ValueError (same contract as every codec here)."""
    from .codecs import _CODEC_ERRORS

    try:
        return _decode_gif(payload)
    except _CODEC_ERRORS as exc:
        raise ValueError(f"corrupt GIF: {type(exc).__name__}: {exc}") from exc


def _decode_gif(payload: bytes) -> np.ndarray:
    from .codecs import MAX_PIXELS

    if payload[:6] not in GIF_MAGICS:
        raise ValueError("not a GIF")
    sw, sh = struct.unpack_from("<HH", payload, 6)
    if not (0 < sw and 0 < sh) or sw * sh > MAX_PIXELS:
        raise ValueError(f"GIF dimensions {sw}x{sh} outside sane bounds")
    packed = payload[10]
    bg_index = payload[11]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=3 * n, offset=pos).reshape(n, 3)
        pos += 3 * n
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x21:  # extension: label + sub-blocks, all skippable
            pos += 1
            _, pos = _sub_blocks(payload, pos)
        elif block == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack_from("<4H", payload, pos)
            ipacked = payload[pos + 8]
            pos += 9
            if not (0 < w and 0 < h) or w * h > MAX_PIXELS:
                raise ValueError(f"GIF frame {w}x{h} outside sane bounds")
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if table is None:
                raise ValueError("GIF image without a color table")
            min_code_size = payload[pos]
            pos += 1
            data, pos = _sub_blocks(payload, pos)
            idx = _lzw_decode(data, min_code_size, w * h)
            if idx.max(initial=0) >= len(table):
                raise ValueError("GIF pixel index outside color table")
            if ipacked & 0x40:  # interlaced: 4 row passes
                rows = np.empty((h, w), dtype=np.int32)
                flat = idx.reshape(h, w)
                r = 0
                for start, step in _INTERLACE_PASSES:
                    n_rows = len(range(start, h, step))
                    rows[start::step] = flat[r : r + n_rows]
                    r += n_rows
                idx = rows.reshape(-1)
            frame = table[idx].reshape(h, w, 3)
            canvas = np.empty((sh, sw, 3), dtype=np.uint8)
            canvas[:] = (gct[bg_index] if gct is not None and bg_index < len(gct) else 0)
            canvas[top : top + h, left : left + w] = frame[: sh - top, : sw - left]
            return canvas
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image frame")


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Fixture-grade GIF89a encoder: palette built from the image's distinct
    colors (must be <= 256), pixels emitted as literal LZW codes with CLEAR
    before each width growth — valid, exact, uncompressed GIF."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("fixture encoder supports <= 256 distinct colors")
    # pad palette to a power of two >= 2
    size = 2
    while size < len(colors):
        size *= 2
    palette = np.zeros((size, 3), dtype=np.uint8)
    palette[: len(colors)] = colors
    mcs = max(2, size.bit_length() - 1)  # LZW min code size (>= 2 per spec)
    clear = 1 << mcs
    eoi = clear + 1

    if interlace:
        order = []
        for start, step in _INTERLACE_PASSES:
            order.extend(range(start, h, step))
        pixels = idx.reshape(h, w)[order].reshape(-1)
    else:
        pixels = idx

    # literal-code LZW: after a CLEAR, a fresh decoder table accepts
    # exactly (2^width - clear - 2) literals before the width would grow —
    # emit another CLEAR just before that point
    acc = 0
    nbits = 0
    body = bytearray()

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = mcs + 1
    budget = (1 << width) - clear - 2
    put(clear, width)
    count = 0
    for p in map(int, pixels):
        if count == budget:
            put(clear, width)
            count = 0
        put(p, width)
        count += 1
    put(eoi, width)
    if nbits:
        body.append(acc & 0xFF)

    out = bytearray(b"GIF89a")
    gct_bits = size.bit_length() - 1  # 2^(bits+1) = size -> bits = log2(size)-1
    out += struct.pack("<HH", w, h) + bytes([0x80 | (gct_bits - 1 if gct_bits else 0), 0, 0])
    out += palette.tobytes()
    out += bytes([0x2C]) + struct.pack("<4H", 0, 0, w, h) + bytes([0x40 if interlace else 0])
    out += bytes([mcs])
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
