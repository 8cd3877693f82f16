"""Pure-python GIF87a/89a codec (static + animated).

Decoder: full spec path — logical screen descriptor, global/local color
tables, GIF-variant LZW (LSB-first packing, growing code widths to 12
bits with NO early change — the opposite corner from TIFF's LZW in
functions/tiff.py), 4-pass interlacing, and the 89a extension blocks:
graphic control (disposal method, transparency index, frame delay),
NETSCAPE looping, comments. Animated GIFs composite per the spec:
disposal 0/1 leave the canvas, 2 clears the frame rect to transparent,
3 restores the pre-frame canvas; transparent pixels leave the canvas
untouched.

Encoder: GIF89a writer — exact for images with <= 256 distinct colors
(builds the palette from the pixels); otherwise quantizes to a uniform
6x7x6 RGB cube. Animated output writes one GCE+image block per frame.

Conformance: cross-checked both directions against the system giflib in
tests/test_gif.py (it decodes our files, we decode its files — GIF is
lossless over indexed pixels so equality is exact); tests skip when
giflib/gcc are unavailable.

Reference behavior: zhoujx4/NLP-Series-relation-extraction has no image
path; GIF joins the multimodal decode set (functions/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# GIF-variant LZW
# ---------------------------------------------------------------------------


def gif_lzw_decode(data: bytes, min_code_size: int) -> bytes:
    """LSB-first LZW with clear/EOI codes and 12-bit cap (no early
    width change, unlike TIFF's variant)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1

    reset()
    out = bytearray()
    buf = nbuf = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbuf < width:
            if pos >= n:
                return bytes(out)  # tolerate missing EOI like giflib
            buf |= data[pos] << nbuf
            pos += 1
            nbuf += 8
        code = buf & ((1 << width) - 1)
        buf >>= width
        nbuf -= width
        if code == clear:
            reset()
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise ValueError("corrupt GIF LZW: non-literal after clear")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def gif_lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """Mirror of gif_lzw_decode (emits CLEAR when the 12-bit table
    fills, the behavior every decoder expects)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    buf = nbuf = 0

    def emit(code: int, w: int):
        nonlocal buf, nbuf
        buf |= code << nbuf
        nbuf += w
        while nbuf >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            nbuf -= 8

    def fresh():
        return {bytes([i]): i for i in range(clear)}

    table = fresh()
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        table[wc] = next_code
        # the encoder widens when the next code to ASSIGN needs it
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            emit(clear, width)
            table = fresh()
            next_code = eoi + 1
            width = min_code_size + 1
        w = c
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbuf:
        out.append(buf & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _deinterlace(idx: np.ndarray) -> np.ndarray:
    h = idx.shape[0]
    out = np.empty_like(idx)
    src = 0
    for start, step in _INTERLACE_PASSES:
        for y in range(start, h, step):
            out[y] = idx[src]
            src += 1
    return out


def _parse_gif(content: bytes):
    """Parse all blocks -> (screen w, h, background ARGB-less index,
    global palette, frames). Each frame: dict(left, top, w, h, idx array,
    palette, transparent index or -1, delay_cs, disposal)."""
    if content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh = struct.unpack("<HH", content[6:10])
    flags = content[10]
    bg = content[11]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            content, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    frames = []
    transparent = -1
    delay_cs = 0
    disposal = 0
    while pos < len(content):
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = content[pos]
            pos += 1
            blocks = []
            while content[pos]:
                ln = content[pos]
                blocks.append(content[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # block terminator
            if label == 0xF9 and blocks:  # graphic control
                gce = blocks[0]
                disposal = (gce[0] >> 2) & 0x07
                delay_cs = struct.unpack("<H", gce[1:3])[0]
                transparent = gce[3] if gce[0] & 0x01 else -1
        elif b == 0x2C:  # image descriptor
            left, top, w, h = struct.unpack("<HHHH", content[pos : pos + 8])
            iflags = content[pos + 8]
            pos += 9
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    content, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("GIF image without any color table")
            mcs = content[pos]
            pos += 1
            lzw = bytearray()
            while content[pos]:
                ln = content[pos]
                lzw += content[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            raw = gif_lzw_decode(bytes(lzw), mcs)
            if len(raw) < w * h:
                raise ValueError(
                    f"GIF frame data truncated: {len(raw)} < {w * h}"
                )
            idx = np.frombuffer(raw, dtype=np.uint8, count=w * h).reshape(
                h, w
            )
            if iflags & 0x40:
                idx = _deinterlace(idx)
            frames.append(
                {
                    "left": left, "top": top, "w": w, "h": h, "idx": idx,
                    "pal": pal, "transparent": transparent,
                    "delay_cs": delay_cs, "disposal": disposal,
                }
            )
            transparent = -1
            delay_cs = 0
            disposal = 0
        else:
            raise ValueError(f"GIF: unknown block 0x{b:02X}")
    if not frames:
        raise ValueError("GIF has no image data")
    return sw, sh, bg, gct, frames


def decode_gif_animation(content: bytes):
    """GIF -> (frames uint8 [n, sh, sw, 4], durations_ms). Disposal and
    transparency composite per the 89a spec."""
    sw, sh, _bg, _gct, frames = _parse_gif(content)
    canvas = np.zeros((sh, sw, 4), np.uint8)
    out = []
    durs = []
    for f in frames:
        x, y, w, h = f["left"], f["top"], f["w"], f["h"]
        before = canvas.copy() if f["disposal"] == 3 else None
        idx = f["idx"]
        pal = f["pal"]
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        region = canvas[y : y + h, x : x + w]
        if f["transparent"] >= 0:
            opaque = idx != f["transparent"]
            region[..., :3] = np.where(opaque[..., None], rgb, region[..., :3])
            region[..., 3] = np.where(opaque, 255, region[..., 3])
        else:
            region[..., :3] = rgb
            region[..., 3] = 255
        out.append(canvas.copy())
        durs.append(f["delay_cs"] * 10)
        if f["disposal"] == 2:
            canvas[y : y + h, x : x + w] = 0
        elif f["disposal"] == 3:
            canvas = before
    return np.stack(out), durs


def decode_image_gif(content: bytes) -> np.ndarray:
    """GIF -> HxWx3 uint8 RGB (first composited frame; transparent
    pixels come out black)."""
    frames, _ = decode_gif_animation(content)
    return frames[0][..., :3].copy()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _palettize(arr: np.ndarray):
    """(palette [n,3], indices [h,w]) — exact when <= 256 distinct
    colors, else quantized to a uniform 6x7x6 cube."""
    h, w = arr.shape[:2]
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) <= 256:
        return colors.astype(np.uint8), inverse.reshape(h, w).astype(np.uint8)
    r = np.minimum(flat[:, 0].astype(np.int64) * 6 // 256, 5)
    g = np.minimum(flat[:, 1].astype(np.int64) * 7 // 256, 6)
    b = np.minimum(flat[:, 2].astype(np.int64) * 6 // 256, 5)
    idx = (r * 7 + g) * 6 + b  # 252 cells
    rr = (np.arange(6) * 255 // 5).astype(np.uint8)
    gg = (np.arange(7) * 255 // 6).astype(np.uint8)
    bb = (np.arange(6) * 255 // 5).astype(np.uint8)
    pal = np.stack(
        np.meshgrid(rr, gg, bb, indexing="ij"), axis=-1
    ).reshape(-1, 3)
    return pal.astype(np.uint8), idx.reshape(h, w).astype(np.uint8)


def _color_table_bits(n_colors: int) -> int:
    bits = 1
    while (2 << (bits - 1)) < n_colors:
        bits += 1
    return bits  # table size = 2 << (bits - 1), stored as bits - 1


def _image_block(idx: np.ndarray, pal: np.ndarray, left=0, top=0) -> bytes:
    h, w = idx.shape
    bits = _color_table_bits(len(pal))
    size = 2 << (bits - 1)
    table = np.zeros((size, 3), np.uint8)
    table[: len(pal)] = pal
    out = bytearray()
    out += b"\x2c" + struct.pack("<HHHH", left, top, w, h)
    out += bytes([0x80 | (bits - 1)])  # local color table, no interlace
    out += table.tobytes()
    mcs = max(2, bits)
    out += bytes([mcs])
    lzw = gif_lzw_encode(idx.tobytes(), mcs)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def encode_image_gif(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 -> static GIF89a (exact for <= 256 distinct colors)."""
    h, w = arr.shape[:2]
    pal, idx = _palettize(np.asarray(arr, dtype=np.uint8))
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])  # no GCT; background 0; no aspect
    out += _image_block(idx, pal)
    out += b"\x3b"
    return bytes(out)


def encode_gif_animation(frames, durations_ms, loop: bool = True) -> bytes:
    """RGB frame list + per-frame durations -> animated GIF89a (one
    local-palette image block per frame, disposal 'none')."""
    h, w = frames[0].shape[:2]
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", w, h)
    out += bytes([0x00, 0, 0])
    if loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f, dur in zip(frames, durations_ms):
        pal, idx = _palettize(np.asarray(f, dtype=np.uint8))
        out += b"\x21\xf9\x04" + bytes([0x00]) + struct.pack(
            "<H", max(0, int(dur)) // 10
        ) + b"\x00\x00"
        out += _image_block(idx, pal)
    out += b"\x3b"
    return bytes(out)
