"""Pure-numpy VP8L (WebP lossless) decoder.

Full lossless bitstream path per the public WebP Lossless Bitstream
Specification (RFC 9649): LSB-first bit reading, simple and
canonical-Huffman code reading (code-length codes with 16/17/18
repeats and the optional max-symbol cap), meta-Huffman groups, color
cache, LZ77 backward references with the 120-entry 2D distance map,
and all four inverse transforms (predictor with its 14 modes, color
transform, subtract-green, color indexing incl. sub-byte pixel
bundling). Lossless means the conformance contract is total: decoding
a libwebp-lossless-encoded stream must reproduce the SOURCE pixels
byte-for-byte (tests/test_vp8l.py).

Reference behavior: zhoujx4/NLP-Series-relation-extraction has no image
path; this completes WebP support (functions/vp8.py handles lossy VP8)
behind functions/multimodal.py:decode_image.
"""

from __future__ import annotations

import struct

import numpy as np

# order in which code-length-code lengths are stored (spec §"Huffman
# code lengths"; same role as DEFLATE's order, different permutation)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 2D distance mapping for LZ77 distance codes 1..120: (dx, dy) within an
# 8-row window (spec §"Distance mapping")
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_TRANSFORM_PREDICTOR = 0
_TRANSFORM_COLOR = 1
_TRANSFORM_SUBTRACT_GREEN = 2
_TRANSFORM_COLOR_INDEXING = 3


class _BitReader:
    """LSB-first bit reader over bytes (reads past the end as zeros,
    which conforming streams never rely on for meaningful bits)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for k in range(n):
            if self.pos < len(self.data):
                b = (self.data[self.pos] >> self.bit) & 1
            else:
                b = 0
            v |= b << k
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.pos += 1
        return v

    def read1(self) -> int:
        if self.pos < len(self.data):
            b = (self.data[self.pos] >> self.bit) & 1
        else:
            b = 0
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b


class _Huffman:
    """Canonical Huffman decoder: codes assigned by increasing length
    then symbol order, descended MSB-first one stream bit at a time."""

    __slots__ = ("table", "single")

    def __init__(self, lengths):
        nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
        if not nz:
            # legal for codes a (meta-)group never uses; only reading is
            # an error
            self.single = None
            self.table = {}
            return
        if len(nz) == 1:
            # degenerate: one symbol, zero bits consumed per emit
            self.single = nz[0][1]
            self.table = None
            return
        self.single = None
        code = 0
        table = {}
        for bit_len in range(1, max(l for l, _ in nz) + 1):
            for l, s in nz:
                if l == bit_len:
                    table[(bit_len, code)] = s
                    code += 1
            code <<= 1
        self.table = table

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | br.read1()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("VP8L: invalid Huffman stream")


def _read_huffman_code(br: _BitReader, alphabet_size: int) -> _Huffman:
    if br.read1():  # simple code
        num_symbols = br.read1() + 1
        first_8bits = br.read1()
        lengths = [0] * alphabet_size
        s0 = br.read(8 if first_8bits else 1)
        if num_symbols == 2:
            s1 = br.read(8)
            lengths[s0] = 1
            lengths[s1] = 1
        else:
            lengths[s0] = 1  # single-symbol code emits without bits;
            # _Huffman detects the one-entry case itself
        return _Huffman(lengths)

    num_codes = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl = _Huffman(cl_lengths)

    if br.read1():  # limited number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl.read(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev = sym
        elif sym == 16:
            for _ in range(3 + br.read(2)):
                if i < alphabet_size:
                    lengths[i] = prev
                    i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
    return _Huffman(lengths)


def _subsample_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_prefix_value(br: _BitReader, code: int) -> int:
    """Length/distance prefix decoding (spec §"LZ77 prefix coding")."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1


def _decode_entropy_image(br: _BitReader, w: int, h: int, level0: bool):
    """DecodeImageStream: [color cache info] + huffman codes (whose
    first bit is the meta-huffman flag, image streams only) + LZ77/cache
    pixel stream -> uint32 ARGB array of length w*h."""
    cache_bits = 0
    if br.read1():
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L: invalid color cache bits {cache_bits}")
    cache_size = (1 << cache_bits) if cache_bits else 0

    # meta-huffman (ARGB image only)
    huff_image = None
    huff_bits = 0
    num_groups = 1
    if level0 and br.read1():
        huff_bits = br.read(3) + 2
        hw, hh = _subsample_size(w, huff_bits), _subsample_size(h, huff_bits)
        huff_image = _decode_image_no_transform(br, hw, hh)
        huff_image = ((huff_image >> 8) & 0xFFFF).astype(np.int64)
        num_groups = int(huff_image.max()) + 1

    groups = []
    for _ in range(num_groups):
        g = (
            _read_huffman_code(br, 256 + 24 + cache_size),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 256),
            _read_huffman_code(br, 40),
        )
        groups.append(g)

    cache = [0] * cache_size
    out = np.zeros(w * h, dtype=np.uint32)
    n = w * h
    pos = 0
    x = 0
    while pos < n:
        if huff_image is not None:
            hx = x >> huff_bits
            hy = (pos // w) >> huff_bits
            group = groups[int(huff_image[hy * _subsample_size(w, huff_bits) + hx])]
        else:
            group = groups[0]
        g_green, g_red, g_blue, g_alpha, g_dist = group
        sym = g_green.read(br)
        if sym < 256:
            green = sym
            red = g_red.read(br)
            blue = g_blue.read(br)
            alpha = g_alpha.read(br)
            argb = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = argb
            if cache_size:
                cache[(0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
            x += 1
            if x == w:
                x = 0
        elif sym < 256 + 24:
            length = _read_prefix_value(br, sym - 256)
            dist_code = _read_prefix_value(br, g_dist.read(br))
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: invalid backward reference")
            for _ in range(length):
                argb = int(out[pos - dist])
                out[pos] = argb
                if cache_size:
                    cache[
                        (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = argb
                pos += 1
                x += 1
                if x == w:
                    x = 0
        else:
            if not cache_size:
                raise ValueError("VP8L: cache symbol without color cache")
            out[pos] = cache[sym - 256 - 24]
            pos += 1
            x += 1
            if x == w:
                x = 0
    return out


def _decode_image_no_transform(br: _BitReader, w: int, h: int) -> np.ndarray:
    return _decode_entropy_image(br, w, h, level0=False)


# ---------------------------------------------------------------------------
# inverse transforms
# ---------------------------------------------------------------------------


def _bytes4(v: int):
    return (v >> 24) & 0xFF, (v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF


def _pack4(a, r, g, b):
    return (a << 24) | (r << 16) | (g << 8) | b


def _add_pixels(a: int, b: int) -> int:
    """Per-channel mod-256 addition of two ARGB words."""
    out = 0
    for shift in (24, 16, 8, 0):
        out |= (((a >> shift) + (b >> shift)) & 0xFF) << shift
    return out


def _avg2_px(a: int, b: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        out |= ((((a >> shift) & 0xFF) + ((b >> shift) & 0xFF)) >> 1) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    pa = 0
    pb = 0
    for shift in (24, 16, 8, 0):
        lc = (l >> shift) & 0xFF
        tc = (t >> shift) & 0xFF
        tlc = (tl >> shift) & 0xFF
        p = lc + tc - tlc
        pa += abs(p - lc)
        pb += abs(p - tc)
    # spec: strictly closer-to-L wins; ties take T
    return l if pa < pb else t


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= (0 if v < 0 else (255 if v > 255 else v)) << shift
    return out


def _clamp_add_sub_half(ave: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (ave >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        d = a - b
        # C-style truncation toward zero, not floor (matters for odd
        # negative differences)
        v = a + (d // 2 if d >= 0 else -((-d) // 2))
        out |= (0 if v < 0 else (255 if v > 255 else v)) << shift
    return out


def _apply_inverse_predictor(
    argb: np.ndarray, w: int, h: int, pred_img: np.ndarray, bits: int
) -> None:
    """In-place inverse of the predictor transform (residuals -> pixels).
    Spec: (0,0) predicts from opaque black; row 0 from L; column 0 from
    T; TR of the last column is the first pixel of the SAME row."""
    pw = _subsample_size(w, bits)
    modes = ((pred_img >> 8) & 0xFF).astype(np.int64)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(argb[i - 1])  # L
            elif x == 0:
                pred = int(argb[i - w])  # T
            else:
                mode = int(modes[(y >> bits) * pw + (x >> bits)])
                L = int(argb[i - 1])
                T = int(argb[i - w])
                TL = int(argb[i - w - 1])
                TR = int(argb[i - w + 1])  # x=w-1: first pixel of this row
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2_px(_avg2_px(L, TR), T)
                elif mode == 6:
                    pred = _avg2_px(L, TL)
                elif mode == 7:
                    pred = _avg2_px(L, T)
                elif mode == 8:
                    pred = _avg2_px(TL, T)
                elif mode == 9:
                    pred = _avg2_px(T, TR)
                elif mode == 10:
                    pred = _avg2_px(_avg2_px(L, TL), _avg2_px(T, TR))
                elif mode == 11:
                    pred = _select(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_sub_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2_px(L, T), TL)
                else:
                    raise ValueError(f"VP8L: bad predictor mode {mode}")
            argb[i] = _add_pixels(int(argb[i]), pred)


def _apply_inverse_color_transform(
    argb: np.ndarray, w: int, h: int, ct_img: np.ndarray, bits: int
) -> None:
    """In-place inverse color transform (spec §"Color transform"):
    red += delta(g2r, green); blue += delta(g2b, green) + delta(r2b, red)."""
    pw = _subsample_size(w, bits)

    def s8(v):
        return v - 256 if v >= 128 else v

    for y in range(h):
        for x in range(w):
            i = y * w + x
            cte = int(ct_img[(y >> bits) * pw + (x >> bits)])
            g2r = s8(cte & 0xFF)
            g2b = s8((cte >> 8) & 0xFF)
            r2b = s8((cte >> 16) & 0xFF)
            px = int(argb[i])
            a, r, g, b = _bytes4(px)
            gs = g - 256 if g >= 128 else g
            r = (r + ((g2r * gs) >> 5)) & 0xFF
            rs = r - 256 if r >= 128 else r
            b = (b + ((g2b * gs) >> 5) + ((r2b * rs) >> 5)) & 0xFF
            argb[i] = _pack4(a, r, g, b)


def _apply_inverse_subtract_green(argb: np.ndarray) -> None:
    g = (argb >> 8) & 0xFF
    r = ((argb >> 16) + g) & 0xFF
    b = (argb + g) & 0xFF
    argb[:] = (argb & 0xFF00FF00) | (r << 16) | b


def _apply_color_indexing(
    argb: np.ndarray, w: int, h: int, palette: np.ndarray, coded_w: int,
    pack_bits: int,
) -> np.ndarray:
    """Inverse color indexing: unbundle sub-byte indices (if any) and map
    through the palette. Returns a NEW w*h array."""
    out = np.zeros(w * h, dtype=np.uint32)
    n_pal = len(palette)
    per = 1 << pack_bits  # pixels packed per coded pixel
    idx_bits = 8 >> pack_bits
    mask = (1 << idx_bits) - 1
    for y in range(h):
        for cx in range(coded_w):
            packed = (int(argb[y * coded_w + cx]) >> 8) & 0xFF
            for k in range(per):
                x = cx * per + k
                if x >= w:
                    break
                idx = (packed >> (k * idx_bits)) & mask
                out[y * w + x] = palette[idx] if idx < n_pal else 0
    return out


# ---------------------------------------------------------------------------
# top-level decode
# ---------------------------------------------------------------------------


def decode_vp8l_argb(payload: bytes):
    """Decode a raw VP8L chunk payload -> (argb uint32 array, w, h)."""
    if not payload or payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read1()  # alpha-is-used hint
    version = br.read(3)
    if version != 0:
        raise ValueError(f"VP8L: unsupported version {version}")
    return _decode_argb_body(br, w, h), w, h


def decode_vp8l_alpha(data: bytes, w: int, h: int) -> np.ndarray:
    """Decode an ALPH chunk's lossless-compressed payload: a header-less
    VP8L image stream of KNOWN dimensions whose green channel carries
    the alpha plane (WebP container spec §Alpha; libwebp encodes these
    with transforms allowed, so the full level-0 path runs)."""
    br = _BitReader(data)
    argb = _decode_argb_body(br, w, h)
    return ((argb >> 8) & 0xFF).astype(np.uint8).reshape(h, w)


def _decode_argb_body(br: _BitReader, w: int, h: int) -> np.ndarray:
    # transforms (top-level image only, each type at most once)
    transforms = []
    coded_w = w
    pal = None
    pal_pack_bits = 0
    while br.read1():
        ttype = br.read(2)
        if ttype == _TRANSFORM_PREDICTOR or ttype == _TRANSFORM_COLOR:
            bits = br.read(3) + 2
            tw, th = _subsample_size(coded_w, bits), _subsample_size(h, bits)
            timg = _decode_image_no_transform(br, tw, th)
            transforms.append((ttype, bits, timg))
        elif ttype == _TRANSFORM_SUBTRACT_GREEN:
            transforms.append((ttype, 0, None))
        elif ttype == _TRANSFORM_COLOR_INDEXING:
            n_colors = br.read(8) + 1
            pal_deltas = _decode_image_no_transform(br, n_colors, 1)
            # palette entries are componentwise cumulative sums
            pal = np.zeros(n_colors, dtype=np.uint32)
            acc = 0
            for i in range(n_colors):
                acc = _add_pixels(acc, int(pal_deltas[i]))
                pal[i] = acc
            if n_colors <= 2:
                pal_pack_bits = 3
            elif n_colors <= 4:
                pal_pack_bits = 2
            elif n_colors <= 16:
                pal_pack_bits = 1
            else:
                pal_pack_bits = 0
            coded_w = _subsample_size(w, pal_pack_bits)
            transforms.append((ttype, pal_pack_bits, pal))
        else:
            raise ValueError(f"VP8L: unknown transform {ttype}")

    argb = _decode_entropy_image(br, coded_w, h, level0=True)

    # inverse transforms, most-recently-read first
    cur_w = coded_w
    for ttype, bits, timg in reversed(transforms):
        if ttype == _TRANSFORM_COLOR_INDEXING:
            argb = _apply_color_indexing(argb, w, h, timg, cur_w, bits)
            cur_w = w
        elif ttype == _TRANSFORM_SUBTRACT_GREEN:
            _apply_inverse_subtract_green(argb)
        elif ttype == _TRANSFORM_PREDICTOR:
            _apply_inverse_predictor(argb, cur_w, h, timg, bits)
        else:
            _apply_inverse_color_transform(argb, cur_w, h, timg, bits)
    return argb


def _find_vp8l_chunk(content: bytes) -> bytes:
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    pos = 12
    end = min(len(content), 8 + struct.unpack("<I", content[4:8])[0])
    while pos + 8 <= end:
        fourcc = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        if fourcc == b"VP8L":
            return content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container has no 'VP8L' chunk")


def decode_webp_lossless_rgba(content: bytes) -> np.ndarray:
    """Lossless WebP -> HxWx4 uint8 RGBA (exact source pixels)."""
    argb, w, h = decode_vp8l_argb(_find_vp8l_chunk(content))
    a = (argb >> 24).astype(np.uint8)
    r = ((argb >> 16) & 0xFF).astype(np.uint8)
    g = ((argb >> 8) & 0xFF).astype(np.uint8)
    b = (argb & 0xFF).astype(np.uint8)
    return np.stack([r, g, b, a], axis=-1).reshape(h, w, 4)


def decode_image_webp_lossless(content: bytes) -> np.ndarray:
    """Lossless WebP -> HxWx3 uint8 RGB (alpha dropped)."""
    return decode_webp_lossless_rgba(content)[:, :, :3].copy()
