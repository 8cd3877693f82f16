"""Pure-numpy PNG codec (zlib is stdlib — no external imaging library).

Together with functions/jpeg.py this closes the compressed-codec gap: the
multimodal path decodes PPM, BMP, baseline JPEG and PNG natively. Scope:
greyscale (0), truecolor (2), indexed (3), grey+alpha (4) and RGBA (6) at
every legal bit depth — 1/2/4-bit (MSB-first packed greyscale/indexed,
exact 255/(2^d-1) rescale), 8-bit, and 16-bit (downsamples to the high
byte) — all five scanline filters, Adam7 interlacing (seven
independently-filtered reduced images scattered back to the full grid),
split IDAT chunks concatenated per the spec.

The encoder writes 8-bit RGB with per-row filter 0 (None), optionally
Adam7-interlaced — deliberately the simplest valid stream; decode is the
hardened side since real corpora arrive encoded by arbitrary writers
(hence full filter and color-type support there).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        len(payload).to_bytes(4, "big")
        + tag
        + payload
        + zlib.crc32(tag + payload).to_bytes(4, "big")
    )


# Adam7 pass geometry: (x0, y0, dx, dy) per pass (PNG spec §8.2)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def encode_image_png(
    arr: np.ndarray, level: int = 6, interlace: bool = False
) -> bytes:
    """Encode an HxWx3 uint8 RGB array as 8-bit truecolor PNG
    (optionally Adam7-interlaced; per-row filter 0 either way)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w = a.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = a[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            parts.append(
                np.concatenate(
                    [np.zeros((ph, 1), np.uint8), sub.reshape(ph, pw * 3)],
                    axis=1,
                ).tobytes()
            )
        raw = b"".join(parts)
    else:
        raw = np.concatenate(
            [np.zeros((h, 1), np.uint8), a.reshape(h, w * 3)], axis=1
        ).tobytes()  # filter byte 0 per row
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def _unfilter(raw: bytes, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering -> [h, w*bpp] uint8."""
    stride = w * bpp
    lines = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(lines[y, 0])
        cur = lines[y, 1:].copy()
        if f == 0:  # None
            pass
        elif f == 1:  # Sub — sequential in x, per-pixel loop over bytes
            for x in range(bpp, stride):
                cur[x] = (int(cur[x]) + int(cur[x - bpp])) & 0xFF
        elif f == 2:  # Up
            cur = (cur.astype(np.int32) + prev).astype(np.uint8)
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG: unknown filter type {f}")
        out[y] = cur
        prev = out[y]
    return out


def decode_image_png(content: bytes) -> np.ndarray:
    """PNG -> HxWx3 uint8 RGB (alpha dropped, grey replicated, palette
    expanded)."""
    data = bytes(content)
    if data[:8] != _SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos < len(data):
        ln = int.from_bytes(data[pos : pos + 4], "big")
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth not in (1, 2, 4, 8, 16):
                raise ValueError(f"invalid PNG: bit depth {depth}")
            if interlace not in (0, 1):
                raise ValueError(f"invalid PNG: interlace {interlace}")
            if comp or filt:
                raise ValueError("invalid PNG: unknown compression/filter")
            ihdr = (w, h, color, depth, interlace)
        elif tag == b"PLTE":
            palette = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("invalid PNG: missing IHDR/IDAT")
    w, h, color, depth, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"invalid PNG: color type {color}")
    if depth == 16 and color == 3:
        raise ValueError("invalid PNG: indexed images cannot be 16-bit")
    if depth < 8 and color not in (0, 3):
        raise ValueError(
            f"invalid PNG: sub-byte depth {depth} with color type {color}"
        )
    raw = zlib.decompress(bytes(idat))

    def unfilter_samples(buf: bytes, ph: int, pw: int) -> np.ndarray:
        """One (sub)image's filtered scanlines -> [ph, pw, channels]
        8-bit SAMPLES. PNG filters operate BYTEWISE with the pixel offset
        in bytes, so one unfilter handles every depth: 16-bit doubles bpp
        (the 16->8 downsample keeps the big-endian high byte, the spec's
        sample-depth rescale); sub-byte depths filter with bpp=1 over
        ceil(pw*depth/8)-byte scanlines, then unpack MSB-first."""
        if depth >= 8:
            sb = depth // 8
            px = _unfilter(buf, ph, pw, channels * sb)
            if sb == 2:
                return px.reshape(ph, pw, channels, 2)[..., 0]
            return px.reshape(ph, pw, channels)
        stride = -(-(pw * depth) // 8)
        rows = _unfilter(buf, ph, stride, 1)  # stride bytes, bpp = 1
        bits = np.unpackbits(rows, axis=1)[:, : pw * depth]
        weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
        vals = (bits.reshape(ph, pw, depth) * weights).sum(
            axis=2, dtype=np.uint16
        )
        return vals.astype(np.uint8)[..., None]

    def scan_bytes(pw: int) -> int:
        return -(-(pw * depth * channels) // 8)

    if interlace:
        # Adam7: seven sequential reduced images, each filtered
        # independently with its own scanline geometry; unfilter each pass
        # and scatter into the full-resolution grid (PNG spec §8.2)
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            n = ph * (scan_bytes(pw) + 1)
            px[y0::dy, x0::dx] = unfilter_samples(raw[off : off + n], ph, pw)
            off += n
    else:
        px = unfilter_samples(raw, h, w)
    if color == 0 and depth < 8:
        # exact sample rescale: 255 / (2^d - 1) is integral for d=1/2/4
        px = (px.astype(np.uint16) * (255 // ((1 << depth) - 1))).astype(
            np.uint8
        )
    if color == 2:
        return px.copy()
    if color == 6:
        return px[..., :3].copy()
    if color == 0:
        return np.repeat(px, 3, axis=2)
    if color == 4:
        return np.repeat(px[..., :1], 3, axis=2)
    if palette is None:
        raise ValueError("invalid PNG: indexed image without PLTE")
    return palette[px[..., 0]]
