"""Pure-numpy WebP lossless (VP8L) codec — decoder + fixture-grade encoder.

Implements the public WebP lossless bitstream format (RFC 9649 / the
"WebP Lossless Bitstream Specification"): RIFF/WEBP container walk,
LSB-first bit reading, simple and normal (code-length-coded) canonical
prefix codes, optional meta-prefix entropy image, color cache, LZ77
backward references with the 120-entry 2D short-distance map, and all
four transforms (predictor with its 14 modes, cross-color, subtract-green,
color-indexing with sub-byte pixel bundling) applied in reverse read
order. Lossy VP8 payloads and animation are out of native scope and
surface as :class:`UnsupportedWebpError` so ``decode_image`` can fall
through to its documented codec-wheel gate.

Crawl-scale role mirrors the other codecs in this package (reference
analogue: the multimodal crawl graft, not the NER repo): decode runs
inside ``mapInPandas`` workers, one payload per row, corrupt bytes of any
kind surface as ValueError. The entropy loop is per-symbol Python (same
fixture-lane status GIF had before its vectorization pass; swap in a C
wheel for production width).

Cited reference files for parity bookkeeping: none — the reference
(lambdavi/SpanLuke) ships no media code; this module exists for the
training-data-pipeline surface (SURVEY.md multimodal section).
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# errors


class UnsupportedWebpError(ValueError):
    """Well-formed WebP using a feature outside the native decoder's scope
    (lossy VP8, animation, fragments). Distinct from plain ValueError
    (= corruption) so ``decode_image`` can fall through to the codec-wheel
    gate for the unsupported-but-valid case only."""


# ---------------------------------------------------------------------------
# bit reader (LSB-first within bytes, like DEFLATE)


class _BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position
        self.nbits = len(data) * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self.nbits:
            raise ValueError("truncated VP8L bitstream")
        byte0 = self.pos >> 3
        shift = self.pos & 7
        # gather enough bytes to cover shift + n bits (n <= 16 in VP8L)
        window = int.from_bytes(self.data[byte0 : byte0 + 4], "little")
        self.pos += n
        return (window >> shift) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Up to ``n`` bits without consuming; past-the-end bits read 0
        (callers re-check consumption against nbits)."""
        byte0 = self.pos >> 3
        shift = self.pos & 7
        window = int.from_bytes(self.data[byte0 : byte0 + 4], "little")
        return (window >> shift) & ((1 << n) - 1)


# ---------------------------------------------------------------------------
# canonical prefix codes

MAX_CODE_LENGTH = 15
# order in which code-length-code lengths are stored (same as the spec)
_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


class _PrefixCode:
    """Canonical prefix code decoded bit-by-bit, MSB-of-code-first (the
    stream itself is LSB-first per byte; prefix-code bits arrive in
    code-MSB order, exactly as in DEFLATE)."""

    __slots__ = ("single", "max_len", "lut_sym", "lut_len")

    def __init__(self, lengths, symbols=None):
        # lengths: list aligned with symbols (or with range(len) if None)
        if symbols is None:
            symbols = range(len(lengths))
        pairs = [(l, s) for l, s in zip(lengths, symbols) if l > 0]
        if not pairs:
            raise ValueError("empty prefix code")
        if len(pairs) == 1:
            # single-symbol code: zero bits consumed per read
            self.single = pairs[0][1]
            self.lut_sym = None
            return
        self.single = None
        kraft = sum(1 << (MAX_CODE_LENGTH - l) for l, _ in pairs)
        if kraft != 1 << MAX_CODE_LENGTH:
            raise ValueError("prefix code lengths are not complete")
        pairs.sort()
        # DEFLATE-style flat lookup keyed by the raw peeked window: canonical
        # code bits arrive MSB-first, the stream is LSB-first, so the LUT
        # index is the bit-reversed code plus every possible suffix
        self.max_len = max_len = pairs[-1][0]
        self.lut_sym = [0] * (1 << max_len)
        self.lut_len = [0] * (1 << max_len)
        code = 0
        prev_len = pairs[0][0]
        for l, s in pairs:
            code <<= l - prev_len
            prev_len = l
            rev = int(f"{code:0{l}b}"[::-1], 2)
            for suffix in range(1 << (max_len - l)):
                idx = rev | (suffix << l)
                self.lut_sym[idx] = s
                self.lut_len[idx] = l
            code += 1

    def read_symbol(self, br: _BitReader) -> int:
        if self.lut_sym is None:
            return self.single
        idx = br.peek(self.max_len)
        length = self.lut_len[idx]
        if br.pos + length > br.nbits:
            raise ValueError("truncated VP8L bitstream")
        br.pos += length
        return self.lut_sym[idx]


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_nbits = 8 if br.read(1) else 1
        symbols = [br.read(first_nbits)]
        if num_symbols == 2:
            symbols.append(br.read(8))
        for s in symbols:
            if s >= alphabet_size:
                raise ValueError("simple prefix symbol out of alphabet")
        if num_symbols == 1:
            return _PrefixCode([1], symbols)  # single-symbol, 0-bit reads
        return _PrefixCode([1, 1], symbols)
    # normal: code lengths are themselves prefix-coded
    num_code_lengths = 4 + br.read(4)
    if num_code_lengths > len(_CODE_LENGTH_ORDER):
        raise ValueError("too many code length codes")
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    lengths = [0] * alphabet_size
    if br.read(1):  # use max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read_symbol(br)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len:
                prev_len = code_len
        else:
            if code_len == 16:
                repeat, val = 3 + br.read(2), prev_len
            elif code_len == 17:
                repeat, val = 3 + br.read(3), 0
            else:  # 18
                repeat, val = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("prefix code length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = val
                symbol += 1
    return _PrefixCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 prefix-value coding and the short-distance neighbor map


def _prefix_value(code: int, br: _BitReader) -> int:
    """Length/distance prefix decoding: codes 0-3 are values 1-4; larger
    codes carry (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _build_distance_map() -> list[tuple[int, int]]:
    """The 120 short-distance codes map to 2D neighbor offsets (dx, dy),
    ordered by squared euclidean distance, ties by decreasing dy, then
    positive dx before negative (the spec's published table follows this
    rule; anchors asserted below)."""
    pairs = [(dx, 0) for dx in range(1, 9)]
    pairs += [(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)]
    pairs.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], p[0] < 0))
    return pairs


_DISTANCE_MAP = _build_distance_map()
assert len(_DISTANCE_MAP) == 120
# anchors from the published table (spec §4.2.2)
assert _DISTANCE_MAP[0] == (0, 1) and _DISTANCE_MAP[1] == (1, 0)
assert _DISTANCE_MAP[2] == (1, 1) and _DISTANCE_MAP[3] == (-1, 1)
assert _DISTANCE_MAP[96] == (8, 0) and _DISTANCE_MAP[119] == (8, 7)
assert _DISTANCE_MAP[34] == (0, 5) and _DISTANCE_MAP[72] == (0, 7)


def _plane_code_to_distance(xsize: int, dist_code: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DISTANCE_MAP[dist_code - 1]
    return max(dy * xsize + dx, 1)


# ---------------------------------------------------------------------------
# entropy-coded image (spatially-coded ARGB plane)

_NUM_LENGTH_CODES = 24
_NUM_DISTANCE_CODES = 40


class _CodeGroup:
    __slots__ = ("green", "red", "blue", "alpha", "distance")

    def __init__(self, br, cache_size):
        self.green = _read_prefix_code(br, 256 + _NUM_LENGTH_CODES + cache_size)
        self.red = _read_prefix_code(br, 256)
        self.blue = _read_prefix_code(br, 256)
        self.alpha = _read_prefix_code(br, 256)
        self.distance = _read_prefix_code(br, _NUM_DISTANCE_CODES)


def _decode_entropy_image(br, xsize, ysize, allow_meta):
    """One spatially-coded image: optional color cache + optional meta
    prefix image (main image only) + LZ77-coded ARGB pixels. Returns a
    flat uint32 array of xsize*ysize ARGB values."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("invalid color cache size")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta_image = None
    meta_bits = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mx = _sub_size(xsize, meta_bits)
        my = _sub_size(ysize, meta_bits)
        meta_argb = _decode_entropy_image(br, mx, my, False)
        meta_image = ((meta_argb >> 8) & 0xFFFF).astype(np.int64)  # (r<<8)|g
        n_groups = int(meta_image.max()) + 1
        meta_w = mx
    groups = [_CodeGroup(br, cache_size) for _ in range(n_groups)]

    npix = xsize * ysize
    pixels = np.zeros(npix, dtype=np.uint32)
    cache = [0] * cache_size
    pos = 0
    group = groups[0]
    single_group = meta_image is None
    while pos < npix:
        if not single_group:
            x, y = pos % xsize, pos // xsize
            group = groups[
                int(meta_image[(y >> meta_bits) * meta_w + (x >> meta_bits)])
            ]
        s = group.green.read_symbol(br)
        if s < 256:
            red = group.red.read_symbol(br)
            blue = group.blue.read_symbol(br)
            alpha = group.alpha.read_symbol(br)
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pixels[pos] = argb
            pos += 1
            if cache_bits:
                cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
        elif s < 256 + _NUM_LENGTH_CODES:
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(group.distance.read_symbol(br), br)
            dist = _plane_code_to_distance(xsize, dist_code)
            if dist > pos or pos + length > npix:
                raise ValueError("LZ77 reference out of bounds")
            for _ in range(length):
                argb = int(pixels[pos - dist])
                pixels[pos] = argb
                pos += 1
                if cache_bits:
                    cache[
                        ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = argb
        else:
            idx = s - 256 - _NUM_LENGTH_CODES
            if idx >= cache_size:
                raise ValueError("color cache index out of range")
            pixels[pos] = cache[idx]
            pos += 1
    return pixels


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# transforms (applied inverse, in reverse read order)

_PREDICTOR, _COLOR, _SUBTRACT_GREEN, _COLOR_INDEXING = 0, 1, 2, 3


def _inv_subtract_green(argb: np.ndarray) -> np.ndarray:
    g = (argb >> 8) & 0xFF
    r = (((argb >> 16) & 0xFF) + g) & 0xFF
    b = ((argb & 0xFF) + g) & 0xFF
    return (argb & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _inv_color_transform(argb, xsize, ysize, tile_bits, tiles):
    """Cross-color inverse: per-tile signed multipliers; delta = (int8(t)
    * int8(c)) >> 5 with arithmetic shift."""
    tw = _sub_size(xsize, tile_bits)
    out = argb.reshape(ysize, xsize)
    g2r = (tiles & 0xFF).astype(np.int32).reshape(-1)
    g2b = ((tiles >> 8) & 0xFF).astype(np.int32).reshape(-1)
    r2b = ((tiles >> 16) & 0xFF).astype(np.int32).reshape(-1)

    def s8(v):
        return np.where(v >= 128, v - 256, v)

    g2r, g2b, r2b = s8(g2r), s8(g2b), s8(r2b)
    ys = np.arange(ysize)[:, None] >> tile_bits
    xs = np.arange(xsize)[None, :] >> tile_bits
    ti = (ys * tw + xs).reshape(-1)
    flat = out.reshape(-1).astype(np.int64)
    g = ((flat >> 8) & 0xFF).astype(np.int32)
    g_s = np.where(g >= 128, g - 256, g).astype(np.int32)
    r = ((flat >> 16) & 0xFF).astype(np.int32)
    b = (flat & 0xFF).astype(np.int32)
    r = (r + ((g2r[ti] * g_s) >> 5)) & 0xFF
    r_s = np.where(r >= 128, r - 256, r).astype(np.int32)
    b = (b + ((g2b[ti] * g_s) >> 5) + ((r2b[ti] * r_s) >> 5)) & 0xFF
    res = (
        (flat & 0xFF00FF00).astype(np.uint32)
        | (r.astype(np.uint32) << np.uint32(16))
        | b.astype(np.uint32)
    )
    return res


def _avg2(a: int, b: int) -> int:
    # per-channel (a+b)//2 on packed ARGB
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_subtract_full(l, t, tl):
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= max(0, min(255, v)) << shift
    return out


def _clamp_add_subtract_half(ave, tl):
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        d = a - b
        half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
        out |= max(0, min(255, a + half)) << shift
    return out


def _select(l, t, tl):
    p_t = p_l = 0
    for shift in (24, 16, 8, 0):
        lc = (l >> shift) & 0xFF
        tc = (t >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        p_l += abs(tc - tlc)  # |p - L| where p = L + T - TL
        p_t += abs(lc - tlc)  # |p - T|
    return t if p_t <= p_l else l


def _inv_predictor_transform(argb, xsize, ysize, tile_bits, tiles):
    """Per-tile predictor modes; residuals are added per channel mod 256.
    Border rules: (0,0) predicts opaque black; top row predicts L; left
    column predicts T. T/TR/TL are addressed linearly (TR of the last
    column is the first pixel of the current row), matching the spec's
    scan-order addressing."""
    tw = _sub_size(xsize, tile_bits)
    modes = ((tiles >> 8) & 0xFF).astype(np.int64)
    px = [int(v) for v in argb]
    for pos in range(xsize * ysize):
        x, y = pos % xsize, pos // xsize
        if pos == 0:
            pred = 0xFF000000
        elif y == 0:
            pred = px[pos - 1]
        elif x == 0:
            pred = px[pos - xsize]
        else:
            mode = int(modes[(y >> tile_bits) * tw + (x >> tile_bits)])
            l = px[pos - 1]
            t = px[pos - xsize]
            tr = px[pos - xsize + 1]
            tl = px[pos - xsize - 1]
            if mode == 0:
                pred = 0xFF000000
            elif mode == 1:
                pred = l
            elif mode == 2:
                pred = t
            elif mode == 3:
                pred = tr
            elif mode == 4:
                pred = tl
            elif mode == 5:
                pred = _avg2(_avg2(l, tr), t)
            elif mode == 6:
                pred = _avg2(l, tl)
            elif mode == 7:
                pred = _avg2(l, t)
            elif mode == 8:
                pred = _avg2(tl, t)
            elif mode == 9:
                pred = _avg2(t, tr)
            elif mode == 10:
                pred = _avg2(_avg2(l, tl), _avg2(t, tr))
            elif mode == 11:
                pred = _select(l, t, tl)
            elif mode == 12:
                pred = _clamp_add_subtract_full(l, t, tl)
            elif mode == 13:
                pred = _clamp_add_subtract_half(_avg2(l, t), tl)
            else:
                raise ValueError("invalid predictor mode")
        res = px[pos]
        px[pos] = (
            (((res >> 24) + (pred >> 24)) & 0xFF) << 24
            | ((((res >> 16) & 0xFF) + ((pred >> 16) & 0xFF)) & 0xFF) << 16
            | ((((res >> 8) & 0xFF) + ((pred >> 8) & 0xFF)) & 0xFF) << 8
            | (((res & 0xFF) + (pred & 0xFF)) & 0xFF)
        )
    return np.asarray(px, dtype=np.uint32)


def _inv_color_indexing(argb, xsize, ysize, palette, width_bits):
    """Palette lookup with sub-byte pixel bundling: the green channel of
    each packed pixel carries (1 << width_bits) indices, LSB-first."""
    n = len(palette)
    if width_bits:
        per = 1 << width_bits
        ibits = 8 >> width_bits
        packed_w = _sub_size(xsize, width_bits)
        g = ((argb.reshape(ysize, packed_w) >> 8) & 0xFF).astype(np.int64)
        idx = np.zeros((ysize, packed_w * per), dtype=np.int64)
        for i in range(per):
            idx[:, i::per] = (g >> (i * ibits)) & ((1 << ibits) - 1)
        idx = idx[:, :xsize].reshape(-1)
    else:
        idx = ((argb >> 8) & 0xFF).astype(np.int64)
    if int(idx.max(initial=0)) >= n:
        raise ValueError("palette index out of range")
    return palette[idx]


def _read_transforms(br, xsize):
    """Reads the transform list; returns (transforms, reduced_xsize).
    Each entry: (type, payload). COLOR_INDEXING reduces the coded width
    for everything read after it."""
    transforms = []
    seen = set()
    reduced_xsize = xsize
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype in (_PREDICTOR, _COLOR):
            tile_bits = br.read(3) + 2
            tw = _sub_size(reduced_xsize, tile_bits)
            transforms.append((ttype, (tile_bits, tw)))
        elif ttype == _SUBTRACT_GREEN:
            transforms.append((ttype, None))
        else:  # COLOR_INDEXING
            if transforms:
                raise UnsupportedWebpError(
                    "color-indexing combined with other transforms is outside "
                    "the native decoder's scope"
                )
            n_colors = br.read(8) + 1
            if n_colors <= 2:
                width_bits = 3
            elif n_colors <= 4:
                width_bits = 2
            elif n_colors <= 16:
                width_bits = 1
            else:
                width_bits = 0
            transforms.append((ttype, (n_colors, width_bits)))
            if width_bits:
                reduced_xsize = _sub_size(reduced_xsize, width_bits)
    return transforms, reduced_xsize


def _decode_vp8l(data: bytes) -> np.ndarray:
    br = _BitReader(data)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature byte")
    xsize = br.read(14) + 1
    ysize = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if xsize * ysize > 64_000_000:
        raise ValueError("VP8L dimensions exceed decoder pixel budget")

    transforms, coded_xsize = _read_transforms(br, xsize)
    # transform payload sub-images are read AFTER the transform list, in
    # transform order, each as its own entropy-coded image
    loaded = []
    for ttype, info in transforms:
        if ttype in (_PREDICTOR, _COLOR):
            tile_bits, tw = info
            th = _sub_size(ysize, tile_bits)
            tiles = _decode_entropy_image(br, tw, th, False)
            loaded.append((ttype, (tile_bits, tiles)))
        elif ttype == _SUBTRACT_GREEN:
            loaded.append((ttype, None))
        else:
            n_colors, width_bits = info
            pal = _decode_entropy_image(br, n_colors, 1, False)
            # palette entries are delta-coded per channel
            b = pal.view(np.uint8).reshape(-1, 4)
            pal = np.cumsum(b.astype(np.uint16), axis=0).astype(np.uint8)
            pal = pal.reshape(-1, 4).copy().view(np.uint32).reshape(-1)
            loaded.append((ttype, (pal, width_bits)))

    argb = _decode_entropy_image(br, coded_xsize, ysize, True)

    for ttype, info in reversed(loaded):
        if ttype == _COLOR_INDEXING:
            pal, width_bits = info
            argb = _inv_color_indexing(argb, xsize, ysize, pal, width_bits)
        elif ttype == _SUBTRACT_GREEN:
            argb = _inv_subtract_green(argb)
        elif ttype == _COLOR:
            tile_bits, tiles = info
            argb = _inv_color_transform(argb, xsize, ysize, tile_bits, tiles)
        else:
            tile_bits, tiles = info
            argb = _inv_predictor_transform(argb, xsize, ysize, tile_bits, tiles)

    rgb = np.empty((ysize, xsize, 3), dtype=np.uint8)
    flat = argb.reshape(ysize, xsize)
    rgb[..., 0] = (flat >> 16) & 0xFF
    rgb[..., 1] = (flat >> 8) & 0xFF
    rgb[..., 2] = flat & 0xFF
    return rgb


# ---------------------------------------------------------------------------
# container


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes -> HxWx3 uint8 RGB. Native scope: lossless (VP8L),
    including inside an extended (VP8X) container. Lossy VP8 / animation
    raise UnsupportedWebpError; corruption raises ValueError."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    riff_size = struct.unpack("<I", payload[4:8])[0]
    if riff_size + 8 > len(payload) + 1:  # +1: odd-size padding tolerance
        raise ValueError("RIFF size exceeds payload")
    off = 12
    while off + 8 <= len(payload):
        fourcc = payload[off : off + 4]
        size = struct.unpack("<I", payload[off + 4 : off + 8])[0]
        body = payload[off + 8 : off + 8 + size]
        if len(body) < size:
            raise ValueError("truncated WebP chunk")
        if fourcc == b"VP8L":
            try:
                return _decode_vp8l(body)
            except (IndexError, struct.error, OverflowError) as exc:
                raise ValueError(f"corrupt VP8L stream: {exc}") from exc
        if fourcc == b"VP8 ":
            raise UnsupportedWebpError("lossy VP8 is outside native scope")
        if fourcc in (b"ANIM", b"ANMF"):
            raise UnsupportedWebpError("animated WebP is outside native scope")
        off += 8 + size + (size & 1)  # chunks are even-aligned
    raise ValueError("no image chunk in WebP container")


# ---------------------------------------------------------------------------
# fixture-grade encoder: literal-only VP8L (exact lossless round-trip)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write(self, value: int, n: int):
        for i in range(n):  # LSB-first
            self.bits.append((value >> i) & 1)

    def write_code(self, code: int, length: int):
        for i in range(length - 1, -1, -1):  # canonical codes go MSB-first
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, bit in enumerate(self.bits):
            out[i >> 3] |= bit << (i & 7)
        return bytes(out)


def _write_flat_literal_code(bw: _BitWriter, alphabet_size: int, nine_green: bool):
    """Emit a 'normal' prefix code whose literals all share one length.

    green (280-symbol alphabet): literals 0-255 at length 9 plus symbol 256
    at length 1 (never emitted) — a complete code. red/blue (256): all
    symbols at length 8 — flat and complete. Written via the code-length
    code with the max_symbol shortcut so no trailing zeros are coded."""
    bw.write(0, 1)  # not simple
    if nine_green:
        used = {1: 1, 9: 1}  # code-length symbols -> their own lengths
        per_symbol = [9] * 256 + [1]
    else:
        used = {0: 1, 8: 1}
        per_symbol = [8] * 256
    max_order_pos = max(_CODE_LENGTH_ORDER.index(s) for s in used)
    num_code_lengths = max_order_pos + 1
    bw.write(num_code_lengths - 4, 4)
    for i in range(num_code_lengths):
        bw.write(used.get(_CODE_LENGTH_ORDER[i], 0), 3)
    # canonical 1-bit codes for the two used code-length symbols
    cl_syms = sorted(used)
    cl_codes = {cl_syms[0]: 0, cl_syms[1]: 1}
    bw.write(1, 1)  # use max_symbol
    bw.write(3, 3)  # length_nbits = 2 + 2*3 = 8
    bw.write(len(per_symbol) - 2, 8)  # max_symbol = 2 + value
    for length in per_symbol:
        bw.write_code(cl_codes[length], 1)


def _write_simple_code(bw: _BitWriter, symbol: int):
    bw.write(1, 1)  # simple
    bw.write(0, 1)  # one symbol
    if symbol < 2:
        bw.write(0, 1)
        bw.write(symbol, 1)
    else:
        bw.write(1, 1)
        bw.write(symbol, 8)


def encode_webp_lossless(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> smallest-machinery legal VP8L stream: no
    transforms, no cache, no meta groups, literal-only (flat prefix codes;
    ~25 bits/pixel — fixture-grade, not a compressor). decode_webp
    round-trips it exactly."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_webp_lossless expects (H, W, 3) uint8")
    h, w = img.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("dimensions out of VP8L range")
    bw = _BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha unused
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix image
    _write_flat_literal_code(bw, 280, nine_green=True)  # green
    _write_flat_literal_code(bw, 256, nine_green=False)  # red
    _write_flat_literal_code(bw, 256, nine_green=False)  # blue
    _write_simple_code(bw, 255)  # alpha: constant 255
    _write_simple_code(bw, 0)  # distance: never used
    # pixel section is a fixed 25-bit layout (green '1'+value 9 bits, red 8,
    # blue 8, all MSB-first; 0-bit alpha/distance) — assemble it vectorized
    flat = img.reshape(-1, 3).astype(np.uint32)
    codes = ((256 + flat[:, 1]) << 16) | (flat[:, 0] << 8) | flat[:, 2]
    pix_bits = ((codes[:, None] >> np.arange(24, -1, -1)) & 1).astype(np.uint8)
    all_bits = np.concatenate(
        [np.asarray(bw.bits, dtype=np.uint8), pix_bits.reshape(-1)]
    )
    data = np.packbits(all_bits, bitorder="little").tobytes()
    chunk = b"VP8L" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff
