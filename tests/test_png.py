"""Pure-numpy PNG codec (functions/png.py): lossless roundtrips, all five
scanline filters, the non-truecolor color types, and the documented
NotImplementedError boundaries."""

import struct
import zlib

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions.png import (
    _chunk,
    _SIG,
    decode_image_png,
    encode_image_png,
)


def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 7 + 3) % 256, (xx * 5 + 90) % 256, ((xx * yy) + 11) % 256],
        axis=-1,
    ).astype(np.uint8)


def test_png_roundtrip_lossless():
    for shape in ((6, 9), (1, 1), (13, 17)):
        img = _gradient(*shape)
        assert (decode_image_png(encode_image_png(img)) == img).all()
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8)
    assert (decode_image_png(encode_image_png(noise)) == noise).all()


def _make_png(img, color, filters, extra_chunks=b"", split_idat=False):
    """Hand-build a PNG with a chosen filter per scanline (the encoder only
    writes filter 0 — the decoder must handle arbitrary writers)."""
    h, w, ch = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = img.reshape(h, w * ch).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(w * ch, np.int32)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        left = np.concatenate([np.zeros(ch, np.int32), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int32), prev[:-ch]])
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - ((left + prev) >> 1)
        else:  # paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        raw.append(f)
        raw.extend((enc & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    comp = zlib.compress(bytes(raw))
    if split_idat:
        mid = len(comp) // 2
        idat = _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    else:
        idat = _chunk(b"IDAT", comp)
    return _SIG + _chunk(b"IHDR", ihdr) + extra_chunks + idat + _chunk(b"IEND", b"")


@pytest.mark.parametrize("filt", [0, 1, 2, 3, 4])
def test_png_each_filter_type_decodes(filt):
    img = _gradient(9, 6)
    assert (decode_image_png(_make_png(img, 2, [filt])) == img).all()


def test_png_mixed_filters_and_split_idat():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(10, 5, 3), dtype=np.uint8)
    data = _make_png(img, 2, [0, 1, 2, 3, 4], split_idat=True)
    assert (decode_image_png(data) == img).all()


def test_png_grayscale_and_alpha_color_types():
    rng = np.random.default_rng(4)
    grey = rng.integers(0, 256, size=(5, 4, 1), dtype=np.uint8)
    out = decode_image_png(_make_png(grey, 0, [2]))
    assert (out == np.repeat(grey, 3, axis=2)).all()
    ga = rng.integers(0, 256, size=(5, 4, 2), dtype=np.uint8)
    out = decode_image_png(_make_png(ga, 4, [4]))
    assert (out == np.repeat(ga[..., :1], 3, axis=2)).all()
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    out = decode_image_png(_make_png(rgba, 6, [1]))
    assert (out == rgba[..., :3]).all()


def test_png_indexed_palette():
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4, 1) % 5
    palette = np.arange(15, dtype=np.uint8).reshape(5, 3) * 13
    plte = _chunk(b"PLTE", palette.tobytes())
    out = decode_image_png(_make_png(idx, 3, [0], extra_chunks=plte))
    assert (out == palette[idx[..., 0]]).all()


def test_png_unsupported_variants_raise_pointedly():
    img = _gradient(4, 4)
    good = encode_image_png(img)
    # every legal depth decodes now, but sub-byte is only valid for
    # grayscale/indexed: flipping an RGB stream's IHDR depth to 4 is a
    # spec violation and must raise, not garble
    bad = bytearray(good)
    bad[8 + 4 + 4 + 8] = 4  # IHDR bit-depth byte
    with pytest.raises(ValueError, match="color type"):
        decode_image_png(bytes(bad))
    bad[8 + 4 + 4 + 8] = 3  # not a legal PNG depth at all
    with pytest.raises(ValueError, match="depth"):
        decode_image_png(bytes(bad))
    # Adam7 is SUPPORTED now — but flipping the interlace bit on a stream
    # whose IDAT is plain makes the pass geometry lie about scanline
    # boundaries; the misread filter bytes must raise, not garble
    bad = bytearray(good)
    bad[8 + 4 + 4 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError, match="filter"):
        decode_image_png(bytes(bad))
    # invalid interlace method id
    bad = bytearray(good)
    bad[8 + 4 + 4 + 12] = 2
    with pytest.raises(ValueError, match="interlace"):
        decode_image_png(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode_image_png(b"not a png")


def test_png_through_decode_image_and_features():
    from nlp_series_relation_extraction_spark.functions.multimodal import (
        decode_image,
        image_features,
    )

    img = _gradient(7, 11)
    dec = decode_image(encode_image_png(img), "image/png")
    assert (dec == img).all()
    feats = image_features(dec)
    assert np.allclose(feats[:3], img.astype(np.float32).mean(axis=(0, 1)))


def _chunk(tag, payload):
    import struct
    import zlib

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def test_16bit_truecolor_downsamples_high_byte():
    import struct
    import zlib

    h, w = 5, 4
    rng = np.random.default_rng(5)
    hi = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    lo = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    samples = np.stack([hi, lo], axis=-1).reshape(h, w * 6)
    raw = b"".join(b"\x00" + samples[y].tobytes() for y in range(h))
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    assert (decode_image_png(png) == hi).all()


def test_16bit_filtered_scanlines_roundtrip():
    # filter 2 (Up) over 16-bit rows: bytewise filtering must still undo
    import struct
    import zlib

    h, w = 3, 2
    hi = np.arange(h * w * 3, dtype=np.uint8).reshape(h, w, 3)
    samples = np.stack(
        [hi, np.zeros_like(hi)], axis=-1
    ).reshape(h, w * 6)
    rows = [b"\x00" + samples[0].tobytes()]
    for y in range(1, h):
        diff = (
            samples[y].astype(np.int16) - samples[y - 1].astype(np.int16)
        ) % 256
        rows.append(b"\x02" + diff.astype(np.uint8).tobytes())
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"".join(rows)))
        + _chunk(b"IEND", b"")
    )
    assert (decode_image_png(png) == hi).all()


def test_sub_byte_minimal_stream_decodes():
    # 2x2 4-bit grayscale (was the unsupported-depth probe; sub-byte
    # decodes now): samples [[15, 0], [3, 12]] pack to one byte per row
    import struct
    import zlib as _z

    raw = b"\x00\xf0" + b"\x00\x3c"
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 4, 0, 0, 0, 0))
        + _chunk(b"IDAT", _z.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = decode_image_png(png)
    assert (out[:, :, 0] == np.array([[255, 0], [51, 204]])).all()


def _rand_img(h, w, seed=9):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize("hw", [(17, 11), (7, 5), (1, 1), (8, 8), (3, 16)])
def test_adam7_interlaced_roundtrip(hw):
    """Adam7 decode: the seven-pass deinterlace reassembles the exact
    source pixels at sizes that exercise empty and partial passes."""
    h, w = hw
    a = _rand_img(h, w)
    b = encode_image_png(a, interlace=True)
    assert (decode_image_png(b) == a).all()
    # interlaced and plain streams decode identically
    assert (decode_image_png(b) == decode_image_png(encode_image_png(a))).all()


def test_adam7_stream_is_actually_interlaced():
    """The interlaced encoding is a different byte stream (pass-ordered),
    not a flag on the same raster — guards against a fake interlace bit."""
    import zlib as _z

    a = _rand_img(16, 16)
    plain = encode_image_png(a)
    inter = encode_image_png(a, interlace=True)
    assert plain != inter

    def idat(buf):
        pos = 8
        out = bytearray()
        while pos < len(buf):
            ln = int.from_bytes(buf[pos : pos + 4], "big")
            tag = buf[pos + 4 : pos + 8]
            if tag == b"IDAT":
                out += buf[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        return _z.decompress(bytes(out))

    # same pixel payload, but one filter byte per PASS scanline: the seven
    # 16x16 passes have 2+2+2+4+4+8+8 = 30 scanlines vs 16 plain
    assert len(idat(inter)) == len(idat(plain)) + (30 - 16)


def _build_png(w, h, depth, color, rows: bytes, palette=None):
    import zlib as _z

    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    out += _chunk(b"IDAT", _z.compress(rows)) + _chunk(b"IEND", b"")
    return out


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_grayscale_decodes_exactly(depth):
    """1/2/4-bit grayscale: MSB-first packed samples, per-row filter byte,
    exact 255/(2^d - 1) rescale — including a width that leaves unused
    trailing bits in the last scanline byte."""
    h, w = 5, 11
    maxv = (1 << depth) - 1
    rng = np.random.default_rng(depth)
    samples = rng.integers(0, maxv + 1, (h, w), dtype=np.uint8)
    rows = bytearray()
    for y in range(h):
        bits = np.unpackbits(
            samples[y][:, None], axis=1, count=8, bitorder="big"
        )[:, 8 - depth :].reshape(-1)
        packed = np.packbits(bits)  # pads trailing bits with 0 per spec
        rows += b"\x00" + packed.tobytes()
    out = decode_image_png(_build_png(w, h, depth, 0, bytes(rows)))
    want = (samples.astype(np.uint16) * (255 // maxv)).astype(np.uint8)
    assert out.shape == (h, w, 3)
    assert (out == np.repeat(want[:, :, None], 3, axis=2)).all()


def test_subbyte_indexed_palette_lookup():
    """4-bit indexed: packed palette indices resolve through PLTE."""
    h, w = 3, 5
    palette = np.array(
        [[250, 0, 0], [0, 250, 0], [0, 0, 250], [7, 8, 9]], dtype=np.uint8
    )
    idx = np.array(
        [[0, 1, 2, 3, 0], [3, 3, 1, 0, 2], [2, 0, 3, 1, 1]], dtype=np.uint8
    )
    rows = bytearray()
    for y in range(h):
        bits = np.unpackbits(idx[y][:, None], axis=1)[:, 4:].reshape(-1)
        rows += b"\x00" + np.packbits(bits).tobytes()
    out = decode_image_png(_build_png(w, h, 4, 3, bytes(rows), palette))
    assert (out == palette[idx]).all()


def test_subbyte_with_up_filter():
    """Sub-byte scanlines still run the byte-wise filters (bpp=1): a row
    filtered with Up(2) must reconstruct against the packed bytes of the
    previous row, not its unpacked samples."""
    h, w, depth = 2, 8, 1
    row0 = np.array([1, 0, 1, 1, 0, 0, 1, 0], dtype=np.uint8)
    row1 = np.array([1, 1, 1, 0, 0, 1, 1, 1], dtype=np.uint8)
    p0 = np.packbits(row0)
    p1 = np.packbits(row1)
    delta = (p1.astype(np.int16) - p0.astype(np.int16)) % 256
    rows = b"\x00" + p0.tobytes() + b"\x02" + delta.astype(np.uint8).tobytes()
    out = decode_image_png(_build_png(w, h, depth, 0, rows))
    want = np.stack([row0, row1]) * 255
    assert (out[:, :, 0] == want).all()
