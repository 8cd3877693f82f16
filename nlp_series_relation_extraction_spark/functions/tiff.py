"""Pure-numpy baseline TIFF codec (uncompressed/LZW/deflate/PackBits,
RGB8 or grayscale-8).

TIFF 6.0 subset every scanner/export pipeline emits as its lossless
option: classic (non-Big) TIFF, either byte order, compression 1 (none),
5 (LZW, the most common lossless TIFF variant, with the spec's
early-change code widths and optional horizontal predictor), 8/32946
(zlib deflate — Adobe and legacy tags) or 32773 (PackBits RLE, the
fax/scanner staple), 8 bits per sample, 1 (grayscale) or 3 (RGB) samples
per pixel, chunky planar config, strip-based AND tiled layout (TIFF 6.0
§15, per-tile compression and predictor), classic AND BigTIFF headers
(magic 43: 8-byte offsets, 20-byte IFD entries, LONG8/SLONG8/IFD8 tag
types) — plus new-style JPEG-in-TIFF (TTN2 compression 7, abbreviated
strips against a shared JPEGTables tag). Conformance is cross-checked
both ways against libtiff, including the LZW early-change width
boundaries at 511/1023/2047 that only large images reach.

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
_TAG_PLANAR = 284
_TAG_PREDICTOR = 317
_TAG_TILE_WIDTH = 322
_TAG_TILE_LENGTH = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_JPEG_TABLES = 347

_LZW_CLEAR, _LZW_EOI = 256, 257


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9->12-bit codes with the
    spec's "early change" (widths bump one code earlier than plain LZW).
    TIFF 6.0 §13; boundary placement pinned empirically against libtiff
    streams in tests/test_tiff.py."""
    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    buf = nbuf = pos = 0
    n = len(data)
    while True:
        while nbuf < width:
            if pos >= n:  # stream ended without EOI: tolerate (libtiff does)
                return bytes(out)
            buf = (buf << 8) | data[pos]
            pos += 1
            nbuf += 8
        code = (buf >> (nbuf - width)) & ((1 << width) - 1)
        nbuf -= width
        if code == _LZW_CLEAR:
            reset()
            continue
        if code == _LZW_EOI:
            return bytes(out)
        if prev is None:
            if code >= 256:
                raise ValueError("corrupt LZW stream: non-literal after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # the KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt LZW stream: code beyond table")
        out += entry
        prev = entry
        # early change, decoder side: widen after defining entry
        # 2^w - 1 (511/1023/2047) — exactly libtiff's
        # free_entp > maxcodep schedule. (A -2 variant decoded our own
        # old streams but NOT libtiff's: real libtiff LZW past 253 table
        # entries failed until this was pinned against its output.)
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    """Mirror of _lzw_decode (early-change widths, clear at table-full)."""
    out = bytearray()
    buf = nbuf = 0

    def emit(code: int, w: int):
        nonlocal buf, nbuf
        buf = (buf << w) | code
        nbuf += w
        while nbuf >= 8:
            out.append((buf >> (nbuf - 8)) & 0xFF)
            nbuf -= 8
        buf &= (1 << nbuf) - 1

    def fresh():
        return {bytes([i]): i for i in range(256)}

    table = fresh()
    next_code, width = 258, 9
    emit(_LZW_CLEAR, width)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        next_code += 1
        # early change, encoder side: first 10-bit emit is the one AFTER
        # defining code 511 (libtiff: free_ent > MAXCODE(nbits)); still
        # one code earlier than plain LZW
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4095:  # table full: clear, like libtiff
            emit(_LZW_CLEAR, width)
            table = fresh()
            next_code, width = 258, 9
        w = c
    if w:
        emit(table[w], width)
    emit(_LZW_EOI, width)
    if nbuf:
        out.append((buf << (8 - nbuf)) & 0xFF)
    return bytes(out)

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 16: 8, 17: 8, 18: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 7: "B", 16: "Q", 17: "q", 18: "Q"}


def _read_values(buf, e, typ, count, value_field, big=False):
    """Tag values, inline when they fit the value field (4 bytes classic,
    8 bytes BigTIFF) else via the offset stored there. Types 16/17/18
    (LONG8/SLONG8/IFD8) are BigTIFF's 8-byte additions."""
    size = _TYPE_SIZES.get(typ)
    if size is None or typ not in _TYPE_FMT:
        raise ValueError(f"unsupported TIFF tag type {typ}")
    total = size * count
    inline = 8 if big else 4
    if total <= inline:
        raw = value_field[:total]
    else:
        (off,) = struct.unpack(e + ("Q" if big else "I"), value_field)
        raw = buf[off : off + total]
    return list(struct.unpack(e + _TYPE_FMT[typ] * count, raw))


def _packbits_decode(data: bytes) -> bytes:
    """PackBits RLE (TIFF 6.0 §9): control byte n in [0,127] copies the
    next n+1 literals; n in [129,255] repeats the next byte 257-n times;
    128 is a no-op."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        i += 1
        if c < 128:
            out += data[i : i + c + 1]
            i += c + 1
        elif c > 128:
            if i < n:
                out += data[i : i + 1] * (257 - c)
                i += 1
        # c == 128: no-op
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: runs of >= 3 identical bytes become repeat packets
    (max 128), everything else literal packets (max 128)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        j = i
        while j < n and j - i < 128:
            r = 1
            while j + r < n and r < 3 and data[j + r] == data[j]:
                r += 1
            if r >= 3:
                break
            j += 1
        out += bytes([j - i - 1]) + data[i:j]
        i = j
    return bytes(out)


def decode_image_tiff(content: bytes) -> np.ndarray:
    """8-bit TIFF (compression none/LZW/deflate/PackBits/JPEG) ->
    HxWx3 uint8 (grayscale replicated, WhiteIsZero inverted)."""
    if len(content) < 8:
        raise ValueError("not a TIFF: too short")
    order = content[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError("not a TIFF: bad byte order mark")
    (magic,) = struct.unpack(e + "H", content[2:4])
    if magic == 42:
        big = False
        (ifd_off,) = struct.unpack(e + "I", content[4:8])
    elif magic == 43:  # BigTIFF
        big = True
        off_size, pad = struct.unpack(e + "HH", content[4:8])
        if off_size != 8 or pad != 0:
            raise ValueError(
                f"invalid BigTIFF header (offset size {off_size}, pad {pad})"
            )
        (ifd_off,) = struct.unpack(e + "Q", content[8:16])
    else:
        raise ValueError(f"not a TIFF (magic {magic}, expected 42 or 43)")
    if big:
        (n_tags,) = struct.unpack(e + "Q", content[ifd_off : ifd_off + 8])
        base, esize, vsize = ifd_off + 8, 20, 8
    else:
        (n_tags,) = struct.unpack(e + "H", content[ifd_off : ifd_off + 2])
        base, esize, vsize = ifd_off + 2, 12, 4
    tags = {}
    for i in range(n_tags):
        o = base + esize * i
        tag, typ = struct.unpack(e + "HH", content[o : o + 4])
        if big:
            (count,) = struct.unpack(e + "Q", content[o + 4 : o + 12])
        else:
            (count,) = struct.unpack(e + "I", content[o + 4 : o + 8])
        tags[tag] = (typ, count, content[o + esize - vsize : o + esize])
    def vals(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise ValueError(f"TIFF missing required tag {tag}")
        typ, count, vf = tags[tag]
        return _read_values(content, e, typ, count, vf, big)

    w, h = vals(_TAG_WIDTH)[0], vals(_TAG_HEIGHT)[0]
    comp = vals(_TAG_COMPRESSION, [1])[0]
    if comp == 7:
        # new-style JPEG-in-TIFF (TIFF TTN2): strips are JPEG streams,
        # optionally abbreviated against a shared JPEGTables (tag 347)
        return _decode_jpeg_in_tiff(content, tags, vals, w, h)
    if comp not in (1, 5, 8, 32946, 32773):
        raise NotImplementedError(
            f"TIFF compression {comp} unsupported (1 = none, 5 = LZW, "
            "8/32946 = deflate, 32773 = PackBits, 7 = JPEG)"
        )
    spp = vals(_TAG_SPP, [1])[0]
    bits = vals(_TAG_BITS, [8] * spp)
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise NotImplementedError(
            f"only 8-bit gray/RGB TIFF supported (bits={bits}, spp={spp})"
        )
    planar = vals(_TAG_PLANAR, [1])[0]
    if planar != 1:
        raise NotImplementedError(
            f"TIFF planar configuration {planar} unsupported (only 1 = "
            "chunky): decoding planar layout as chunky would interleave "
            "whole color planes into garbage pixels"
        )
    # photometric 0 = WhiteIsZero (min-is-white grayscale — invert), 1 =
    # BlackIsZero, 2 = RGB. Anything else (palette, CMYK, YCbCr) would
    # decode to silently wrong colors, so raise like other unsupported
    # variants instead of guessing.
    photometric = vals(_TAG_PHOTOMETRIC, [1 if spp == 1 else 2])[0]
    if photometric not in (0, 1, 2):
        raise NotImplementedError(
            f"TIFF photometric interpretation {photometric} unsupported "
            "(only 0/1 grayscale, 2 RGB)"
        )
    if photometric == 2 and spp != 3 or photometric in (0, 1) and spp != 1:
        raise ValueError(
            f"TIFF photometric {photometric} inconsistent with spp {spp}"
        )
    predictor = vals(_TAG_PREDICTOR, [1])[0]
    if predictor not in (1, 2):
        raise NotImplementedError(
            f"TIFF predictor {predictor} unsupported (only 1 = none, "
            "2 = horizontal differencing)"
        )
    if _TAG_TILE_WIDTH in tags:
        return _decode_tiled(
            content, vals, w, h, spp, comp, predictor, photometric
        )
    offsets = vals(_TAG_STRIP_OFFSETS)
    counts = vals(_TAG_STRIP_COUNTS)
    strips = [content[off : off + cnt] for off, cnt in zip(offsets, counts)]
    # each strip is an independently compressed stream (TIFF 6.0 §13/§9)
    if comp == 5:
        strips = [_lzw_decode(s) for s in strips]
    elif comp in (8, 32946):
        import zlib

        try:
            strips = [zlib.decompress(s) for s in strips]
        except zlib.error as exc:
            # keep the decoder's error contract: corrupt payloads raise
            # ValueError so extract_features' fallback catches them
            # instead of the zlib.error killing the whole Spark task
            raise ValueError(f"invalid TIFF: bad deflate strip ({exc})")
    elif comp == 32773:
        strips = [_packbits_decode(s) for s in strips]
    data = b"".join(strips)
    need = w * h * spp
    if len(data) < need:
        raise ValueError(f"TIFF strip data truncated: {len(data)} < {need}")
    arr = np.frombuffer(data[:need], dtype=np.uint8).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing stores per-row deltas per channel;
        # undo with a mod-256 cumulative sum along the width axis.
        arr = np.cumsum(arr.astype(np.uint32), axis=1).astype(np.uint8)
    if photometric == 0:
        arr = 255 - arr
    if spp == 1:
        arr = np.repeat(arr, 3, axis=2)
    out = np.ascontiguousarray(arr)
    if out.base is not None or not out.flags.writeable:
        # the common path (chunky RGB, no predictor) is still the
        # read-only np.frombuffer view pinning the whole source buffer —
        # return a fresh writable array like the other decoders do
        out = out.copy()
    return out


def encode_image_tiff(
    arr: np.ndarray,
    byte_order: str = "II",
    rows_per_strip: int | None = None,
    compression: str = "none",
    predictor: int = 1,
) -> bytes:
    """HxWx3 uint8 -> classic TIFF (strip-based; default one strip, pass
    rows_per_strip to exercise multi-strip layout; compression in
    {'none','lzw','deflate','packbits'}; predictor=2 adds horizontal
    differencing)."""
    h, w, _ = arr.shape
    e = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or h
    a = arr
    if predictor == 2:
        a = np.empty_like(arr)
        a[:, 0] = arr[:, 0]
        a[:, 1:] = (
            arr[:, 1:].astype(np.int16) - arr[:, :-1].astype(np.int16)
        ).astype(np.uint8)
    comp_id = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}[
        compression
    ]
    strips = [a[r : r + rps].tobytes() for r in range(0, h, rps)]
    if comp_id == 5:
        strips = [_lzw_encode(s) for s in strips]
    elif comp_id == 8:
        import zlib

        strips = [zlib.compress(s, 6) for s in strips]
    elif comp_id == 32773:
        # TIFF 6.0 §9: each ROW is compressed independently even when a
        # strip holds several rows — packets must not span row boundaries
        # (strict row-at-a-time readers rely on it; our own decoder is
        # byte-stream tolerant either way). Encode per row, concatenate.
        row_bytes = w * 3
        strips = [
            b"".join(
                _packbits_encode(s[r : r + row_bytes])
                for r in range(0, len(s), row_bytes)
            )
            for s in strips
        ]
    # header(8) + IFD: count(2) + n tags * 12 + next(4), then bits array,
    # then strip offset/count arrays (if > 1 strip), then pixel strips
    n_tags = 10 + (1 if predictor == 2 else 0)
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
        entry(_TAG_COMPRESSION, 3, 1, short_val(comp_id)),
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
        entry(_TAG_PLANAR, 3, 1, short_val(1)),
    ]
    if predictor == 2:
        entries.append(entry(_TAG_PREDICTOR, 3, 1, short_val(2)))
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


# ---------------------------------------------------------------------------
# new-style JPEG-in-TIFF (TIFF Technical Note 2 / compression 7)
# ---------------------------------------------------------------------------


_SOI, _EOI, _SOS = b"\xff\xd8", b"\xff\xd9", 0xDA


def _split_jpeg_tables(stream: bytes):
    """Split a complete JPEG stream into (tables_stream, abbreviated
    strip stream): DQT/DHT segments move to an SOI..EOI tables stream
    (the JPEGTables tag payload, TTN2), the rest keeps its own SOI and
    entropy data."""
    if stream[:2] != _SOI:
        raise ValueError("not a JPEG stream")
    tables = bytearray()
    rest = bytearray()
    i = 2
    while i + 4 <= len(stream):
        if stream[i] != 0xFF:
            raise ValueError("bad JPEG marker segment")
        marker = stream[i + 1]
        if marker == _SOS:
            rest += stream[i:]  # SOS through EOI, verbatim
            break
        seglen = int.from_bytes(stream[i + 2 : i + 4], "big")
        seg = stream[i : i + 2 + seglen]
        if marker in (0xDB, 0xC4):  # DQT / DHT
            tables += seg
        else:
            rest += seg
        i += 2 + seglen
    return _SOI + bytes(tables) + _EOI, _SOI + bytes(rest)


def _merge_jpeg_tables(tables: bytes | None, strip: bytes) -> bytes:
    """Splice a JPEGTables payload (SOI..EOI) into an abbreviated strip
    stream right after its SOI; pass-through when there are no tables."""
    if strip[:2] != _SOI:
        raise ValueError("TIFF JPEG strip does not start with SOI")
    if not tables or len(tables) <= 4:
        return strip
    interior = tables[2:]
    if interior[-2:] == _EOI:
        interior = interior[:-2]
    return _SOI + interior + strip[2:]


def _decode_jpeg_in_tiff(content, tags, vals, w, h):
    from .jpeg import decode_image_jpeg

    photometric = vals(_TAG_PHOTOMETRIC, [6])[0]
    if photometric not in (1, 2, 6):
        raise NotImplementedError(
            f"JPEG-in-TIFF photometric {photometric} unsupported "
            "(1 grayscale, 2 RGB, 6 YCbCr; the JPEG stream itself "
            "determines the color decode)"
        )
    rps = vals(_TAG_ROWS_PER_STRIP, [h])[0]
    offsets = vals(_TAG_STRIP_OFFSETS)
    counts = vals(_TAG_STRIP_COUNTS)
    tables = None
    if _TAG_JPEG_TABLES in tags:
        tbl = vals(_TAG_JPEG_TABLES)
        tables = bytes(tbl)
    rows = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        strip = content[off : off + cnt]
        img = decode_image_jpeg(_merge_jpeg_tables(tables, strip))
        want_h = min(rps, h - si * rps)
        if img.shape[0] < want_h or img.shape[1] < w:
            raise ValueError(
                f"JPEG-in-TIFF strip {si} decodes to {img.shape[:2]}, "
                f"need at least ({want_h}, {w})"
            )
        rows.append(img[:want_h, :w])
    out = np.concatenate(rows, axis=0)
    if out.shape[0] != h:
        raise ValueError(f"JPEG-in-TIFF strips cover {out.shape[0]} of {h} rows")
    return np.ascontiguousarray(out)


def encode_image_tiff_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    rows_per_strip: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """HxWx3 uint8 -> classic TIFF with new-style JPEG compression
    (TTN2): per-strip abbreviated JPEG streams + one shared JPEGTables
    tag (347), photometric 6 (YCbCr), the layout libtiff/scanners emit
    for lossy TIFF."""
    from .jpeg import encode_image_jpeg

    h, w, _ = arr.shape
    e = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or h
    strips = []
    tables = None
    for r in range(0, h, rps):
        full = encode_image_jpeg(arr[r : r + rps], quality=quality,
                                 subsampling="420")
        tbl, abbrev = _split_jpeg_tables(full)
        if tables is None:
            tables = tbl  # same quality => identical tables each strip
        strips.append(abbrev)
    n_strips = len(strips)

    n_tags = 11
    ifd_off = 8
    after_ifd = ifd_off + 2 + n_tags * 12 + 4
    bits_off = after_ifd
    pos = bits_off + 6
    if n_strips > 1:
        so_off = pos
        sc_off = so_off + 4 * n_strips
        pos = sc_off + 4 * n_strips
    else:
        so_off = sc_off = 0
    tbl_off = pos
    pos += len(tables)
    offs = []
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
        entry(_TAG_COMPRESSION, 3, 1, short_val(7)),
        entry(_TAG_PHOTOMETRIC, 3, 1, short_val(6)),  # YCbCr
        entry(
            _TAG_STRIP_OFFSETS, 4, n_strips,
            long_val(offs[0] if n_strips == 1 else so_off),
        ),
        entry(_TAG_SPP, 3, 1, short_val(3)),
        entry(_TAG_ROWS_PER_STRIP, 4, 1, long_val(rps)),
        entry(
            _TAG_STRIP_COUNTS, 4, n_strips,
            long_val(len(strips[0]) if n_strips == 1 else sc_off),
        ),
        entry(_TAG_PLANAR, 3, 1, short_val(1)),
        entry(_TAG_JPEG_TABLES, 7, len(tables), long_val(tbl_off)),
    ]
    out = bytearray()
    out += (b"II" if e == "<" else b"MM") + struct.pack(e + "HI", 42, ifd_off)
    out += struct.pack(e + "H", n_tags)
    for ent in sorted(entries, key=lambda s: struct.unpack(e + "H", s[:2])[0]):
        out += ent
    out += struct.pack(e + "I", 0)  # next IFD
    out += struct.pack(e + "HHH", 8, 8, 8)
    if n_strips > 1:
        for o in offs:
            out += struct.pack(e + "I", o)
        for s in strips:
            out += struct.pack(e + "I", len(s))
    out += tables
    for s in strips:
        out += s
    return bytes(out)


def _decode_tiled(content, vals, w, h, spp, comp, predictor, photometric):
    """Tiled layout (TIFF 6.0 §15): the image is a grid of fixed-size
    tiles, each an independently compressed tw x tl block (edge tiles
    padded to full size); the predictor restarts on every tile row."""
    tw = vals(_TAG_TILE_WIDTH)[0]
    tl = vals(_TAG_TILE_LENGTH)[0]
    if tw % 16 or tl % 16:
        raise ValueError(f"TIFF tile size {tw}x{tl} not multiples of 16")
    offsets = vals(_TAG_TILE_OFFSETS)
    counts = vals(_TAG_TILE_COUNTS)
    ntx = -(-w // tw)
    nty = -(-h // tl)
    if len(offsets) < ntx * nty:
        raise ValueError(
            f"TIFF tiled: {len(offsets)} tiles for a {ntx}x{nty} grid"
        )
    canvas = np.zeros((nty * tl, ntx * tw, spp), np.uint8)
    for i in range(ntx * nty):
        data = content[offsets[i] : offsets[i] + counts[i]]
        if comp == 5:
            data = _lzw_decode(data)
        elif comp in (8, 32946):
            import zlib

            try:
                data = zlib.decompress(data)
            except zlib.error as exc:
                raise ValueError(
                    f"invalid TIFF: bad deflate tile ({exc})"
                )
        elif comp == 32773:
            data = _packbits_decode(data)
        need = tw * tl * spp
        if len(data) < need:
            raise ValueError(
                f"TIFF tile {i} truncated: {len(data)} < {need}"
            )
        tile = np.frombuffer(data, np.uint8, count=need).reshape(tl, tw, spp)
        if predictor == 2:
            tile = np.cumsum(tile.astype(np.uint32), axis=1).astype(np.uint8)
        ty, tx = divmod(i, ntx)
        canvas[ty * tl : (ty + 1) * tl, tx * tw : (tx + 1) * tw] = tile
    arr = canvas[:h, :w]
    if photometric == 0:
        arr = 255 - arr
    if spp == 1:
        arr = np.repeat(arr, 3, axis=2)
    return np.ascontiguousarray(arr)
