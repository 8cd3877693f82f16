"""Pure-numpy baseline TIFF codec (uncompressed RGB8 / grayscale-8).

TIFF 6.0 subset every scanner/export pipeline emits as its lossless
option: classic (non-Big) TIFF, either byte order, compression=1 (none),
8 bits per sample, 1 (grayscale) or 3 (RGB) samples per pixel, chunky
planar config, strip-based layout (any RowsPerStrip, incl. one strip).
LZW/deflate/tiled/BigTIFF remain with the other compressed exotics at the
decode_image integration point.

Layout refresher: an 8-byte header (II*\0 / MM\0*) points at the first
IFD — a count followed by 12-byte tag entries (tag, type, count, value/
offset) and a next-IFD pointer. Pixel bytes live wherever StripOffsets
says; nothing is contiguous by guarantee, which is why the reader walks
tags instead of assuming a fixed layout.
"""

from __future__ import annotations

import struct

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_PHOTOMETRIC = 262
_TAG_STRIP_OFFSETS = 273
_TAG_SPP = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I"}


def _read_values(buf, e, typ, count, value_field):
    size = _TYPE_SIZES.get(typ)
    if size is None or typ not in _TYPE_FMT:
        raise ValueError(f"unsupported TIFF tag type {typ}")
    total = size * count
    if total <= 4:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(e + "I", value_field)
        raw = buf[off : off + total]
    return list(struct.unpack(e + _TYPE_FMT[typ] * count, raw))


def decode_image_tiff(content: bytes) -> np.ndarray:
    """Uncompressed 8-bit TIFF -> HxWx3 uint8 (grayscale replicated)."""
    if len(content) < 8:
        raise ValueError("not a TIFF: too short")
    order = content[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte order mark")
    magic, ifd_off = struct.unpack(e + "HI", content[2:8])
    if magic != 42:
        raise ValueError("not a classic TIFF (BigTIFF unsupported)")
    (n_tags,) = struct.unpack(e + "H", content[ifd_off : ifd_off + 2])
    tags = {}
    for i in range(n_tags):
        o = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack(e + "HHI", content[o : o + 8])
        tags[tag] = (typ, count, content[o + 8 : o + 12])
    def vals(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise ValueError(f"TIFF missing required tag {tag}")
        typ, count, vf = tags[tag]
        return _read_values(content, e, typ, count, vf)

    w, h = vals(_TAG_WIDTH)[0], vals(_TAG_HEIGHT)[0]
    comp = vals(_TAG_COMPRESSION, [1])[0]
    if comp != 1:
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (only 1 = none)"
        )
    spp = vals(_TAG_SPP, [1])[0]
    bits = vals(_TAG_BITS, [8] * spp)
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError(
            f"only 8-bit gray/RGB TIFF supported (bits={bits}, spp={spp})"
        )
    offsets = vals(_TAG_STRIP_OFFSETS)
    counts = vals(_TAG_STRIP_COUNTS)
    data = b"".join(
        content[off : off + cnt] for off, cnt in zip(offsets, counts)
    )
    need = w * h * spp
    if len(data) < need:
        raise ValueError(f"TIFF strip data truncated: {len(data)} < {need}")
    arr = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, spp)
    if spp == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr.copy()


def encode_image_tiff(
    arr: np.ndarray, byte_order: str = "II", rows_per_strip: int | None = None
) -> bytes:
    """HxWx3 uint8 -> uncompressed classic TIFF (strip-based; default one
    strip, pass rows_per_strip to exercise multi-strip layout)."""
    h, w, _ = arr.shape
    e = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or h
    strips = [
        arr[r : r + rps].tobytes() for r in range(0, h, rps)
    ]
    # header(8) + IFD: count(2) + 10 tags * 12 + next(4), then bits array,
    # then strip offset/count arrays (if > 1 strip), then pixel strips
    n_tags = 10
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_tags * 12 + 4
    bits_off = after_ifd
    arrays_off = bits_off + 6  # 3 SHORTs for BitsPerSample
    n_strips = len(strips)
    if n_strips > 1:
        so_off = arrays_off
        sc_off = so_off + 4 * n_strips
        data_off = sc_off + 4 * n_strips
    else:
        so_off = sc_off = 0
        data_off = arrays_off
    offs, pos = [], data_off
    for s in strips:
        offs.append(pos)
        pos += len(s)

    def entry(tag, typ, count, value):
        return struct.pack(e + "HHI", tag, typ, count) + value

    def long_val(v):
        return struct.pack(e + "I", v)

    def short_val(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    entries = [
        entry(_TAG_WIDTH, 4, 1, long_val(w)),
        entry(_TAG_HEIGHT, 4, 1, long_val(h)),
        entry(_TAG_BITS, 3, 3, long_val(bits_off)),
        entry(_TAG_COMPRESSION, 3, 1, short_val(1)),
        entry(_TAG_PHOTOMETRIC, 3, 1, short_val(2)),  # RGB
        entry(
            _TAG_STRIP_OFFSETS,
            4,
            n_strips,
            long_val(offs[0] if n_strips == 1 else so_off),
        ),
        entry(_TAG_SPP, 3, 1, short_val(3)),
        entry(_TAG_ROWS_PER_STRIP, 4, 1, long_val(rps)),
        entry(
            _TAG_STRIP_COUNTS,
            4,
            n_strips,
            long_val(len(strips[0]) if n_strips == 1 else sc_off),
        ),
        # PlanarConfiguration = 1 (chunky)
        entry(284, 3, 1, short_val(1)),
    ]
    out = bytearray()
    out += (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n_tags)
    for en in sorted(entries[: n_tags], key=lambda b: struct.unpack(e + "H", b[:2])[0]):
        out += en
    out += struct.pack(e + "I", 0)  # no next IFD
    out += struct.pack(e + "HHH", 8, 8, 8)  # BitsPerSample values
    if n_strips > 1:
        for o in offs:
            out += struct.pack(e + "I", o)
        for s in strips:
            out += struct.pack(e + "I", len(s))
    for s in strips:
        out += s
    return bytes(out)
