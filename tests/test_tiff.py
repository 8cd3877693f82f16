"""Uncompressed-TIFF codec (functions/tiff.py) and its multimodal wiring."""

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions.multimodal import (
    decode_image,
)
from nlp_series_relation_extraction_spark.functions.tiff import (
    decode_image_tiff,
    encode_image_tiff,
)


def _img(h, w, seed=3):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@pytest.mark.parametrize("byte_order", ["II", "MM"])
@pytest.mark.parametrize("rows_per_strip", [None, 4])
def test_roundtrip_both_endians_and_strip_layouts(byte_order, rows_per_strip):
    a = _img(17, 11)
    b = encode_image_tiff(a, byte_order=byte_order, rows_per_strip=rows_per_strip)
    assert (decode_image_tiff(b) == a).all()


def test_grayscale_replicates_channels():
    # hand-build a minimal grayscale (spp=1) file: header + 7-tag IFD +
    # one strip of raw luma bytes; the decoder must replicate to 3 chans
    import struct

    h, w = 4, 6
    gray = _img(h, w)[:, :, 0]
    n_tags = 7
    ifd_off = 8
    data_off = ifd_off + 2 + n_tags * 12 + 4

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + value

    L = lambda v: struct.pack("<I", v)  # noqa: E731
    S = lambda v: struct.pack("<H", v) + b"\x00\x00"  # noqa: E731
    buf = b"II" + struct.pack("<HI", 42, ifd_off)
    buf += struct.pack("<H", n_tags)
    buf += entry(256, 4, 1, L(w))          # width
    buf += entry(257, 4, 1, L(h))          # height
    buf += entry(258, 3, 1, S(8))          # bits
    buf += entry(259, 3, 1, S(1))          # no compression
    buf += entry(273, 4, 1, L(data_off))   # strip offset
    buf += entry(277, 3, 1, S(1))          # spp = 1 (grayscale)
    buf += entry(279, 4, 1, L(h * w))      # strip byte count
    buf += struct.pack("<I", 0)
    buf += gray.tobytes()
    out = decode_image_tiff(buf)
    assert out.shape == (h, w, 3)
    assert (out == np.repeat(gray[:, :, None], 3, axis=2)).all()


def test_dispatch_through_decode_image():
    a = _img(9, 9)
    assert (decode_image(encode_image_tiff(a), "image/tiff") == a).all()


def test_rejects_compressed_and_garbage():
    with pytest.raises(ValueError):
        decode_image_tiff(b"nottiff")
    a = encode_image_tiff(_img(4, 4))
    # flip the compression tag value (type SHORT at its entry) to 3
    # (CCITT Group 3 fax) — still unsupported (LZW/deflate/PackBits AND
    # JPEG-in-TIFF decode natively now)
    import struct

    idx = a.index(struct.pack("<HHI", 259, 3, 1))
    bad = a[: idx + 8] + struct.pack("<H", 3) + a[idx + 10 :]
    with pytest.raises(NotImplementedError):
        decode_image_tiff(bad)


@pytest.mark.parametrize("byte_order", ["II", "MM"])
@pytest.mark.parametrize("rows_per_strip", [None, 4])
@pytest.mark.parametrize("predictor", [1, 2])
def test_lzw_roundtrip(byte_order, rows_per_strip, predictor):
    a = _img(17, 11, seed=9)
    b = encode_image_tiff(
        a,
        byte_order=byte_order,
        rows_per_strip=rows_per_strip,
        compression="lzw",
        predictor=predictor,
    )
    assert (decode_image_tiff(b) == a).all()


def test_lzw_compresses_redundant_data():
    # a constant image must actually shrink (proves LZW is real, not a
    # stored-bytes stand-in) and still roundtrip exactly
    a = np.full((64, 64, 3), 200, dtype=np.uint8)
    raw = encode_image_tiff(a)
    lzw = encode_image_tiff(a, compression="lzw")
    assert len(lzw) < len(raw) // 4
    assert (decode_image_tiff(lzw) == a).all()


def test_lzw_long_stream_exercises_width_changes():
    # enough distinct bytes that the code table passes the 9->10->11->12
    # bit early-change boundaries and a mid-stream CLEAR
    from nlp_series_relation_extraction_spark.functions.tiff import (
        _lzw_decode,
        _lzw_encode,
    )

    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, 40_000, dtype=np.uint8).tobytes()
    assert _lzw_decode(_lzw_encode(data)) == data


@pytest.mark.parametrize("compression", ["deflate", "packbits"])
@pytest.mark.parametrize("rows_per_strip", [None, 4])
def test_deflate_packbits_roundtrip(compression, rows_per_strip):
    a = _img(17, 11, seed=13)
    b = encode_image_tiff(
        a, rows_per_strip=rows_per_strip, compression=compression
    )
    assert (decode_image_tiff(b) == a).all()
    # constant image: both codecs must actually compress
    flat = np.full((32, 32, 3), 7, dtype=np.uint8)
    enc = encode_image_tiff(flat, compression=compression)
    assert len(enc) < len(encode_image_tiff(flat)) // 2
    assert (decode_image_tiff(enc) == flat).all()


def test_packbits_known_vector():
    # the TIFF 6.0 spec's own PackBits example
    from nlp_series_relation_extraction_spark.functions.tiff import (
        _packbits_decode,
        _packbits_encode,
    )

    encoded = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00,
         0x2A, 0x22, 0xF7, 0xAA]
    )
    decoded = (
        b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert _packbits_decode(encoded) == decoded
    # our encoder's output decodes back (format-level inverse, not
    # byte-identical to the spec's hand encoding)
    assert _packbits_decode(_packbits_encode(decoded)) == decoded


def test_whitezero_grayscale_inverts_and_planar_rejected():
    import struct

    a = _img(6, 5)
    buf = encode_image_tiff(a)
    # photometric tag is SHORT value 2 (RGB) in the encoder output;
    # planar flip: rewrite tag 284 value to 2 -> must raise
    idx = buf.index(struct.pack("<HHI", 284, 3, 1))
    planar2 = buf[: idx + 8] + struct.pack("<H", 2) + buf[idx + 10 :]
    with pytest.raises(NotImplementedError):
        decode_image_tiff(planar2)
    # photometric=5 (separated/CMYK) -> must raise, not garble
    idx = buf.index(struct.pack("<HHI", 262, 3, 1))
    pm5 = buf[: idx + 8] + struct.pack("<H", 5) + buf[idx + 10 :]
    with pytest.raises(NotImplementedError):
        decode_image_tiff(pm5)


def test_whitezero_grayscale_inverted_pixels():
    # hand-build a WhiteIsZero (photometric=0) grayscale file: decoder
    # must invert (255 - v), not pass through
    import struct

    h, w = 3, 4
    gray = _img(h, w, seed=7)[:, :, 0]
    n_tags = 8
    ifd_off = 8
    data_off = ifd_off + 2 + n_tags * 12 + 4

    def entry(tag, typ, count, value):
        return struct.pack("<HHI", tag, typ, count) + value

    L = lambda v: struct.pack("<I", v)  # noqa: E731
    S = lambda v: struct.pack("<H", v) + b"\x00\x00"  # noqa: E731
    buf = b"II" + struct.pack("<HI", 42, ifd_off)
    buf += struct.pack("<H", n_tags)
    buf += entry(256, 4, 1, L(w))
    buf += entry(257, 4, 1, L(h))
    buf += entry(258, 3, 1, S(8))
    buf += entry(259, 3, 1, S(1))
    buf += entry(262, 3, 1, S(0))          # WhiteIsZero
    buf += entry(273, 4, 1, L(data_off))
    buf += entry(277, 3, 1, S(1))
    buf += entry(279, 4, 1, L(h * w))
    buf += struct.pack("<I", 0)
    buf += gray.tobytes()
    out = decode_image_tiff(buf)
    inv = 255 - gray
    assert (out == np.repeat(inv[:, :, None], 3, axis=2)).all()


def test_lzw_dispatch_through_decode_image():
    a = _img(9, 9, seed=11)
    b = encode_image_tiff(a, compression="lzw", predictor=2)
    assert (decode_image(b, "image/tiff-lzw") == a).all()
    assert (decode_image(b, "image/tiff") == a).all()


@pytest.mark.parametrize("fmt", ["image/tiff", "image/tiff-lzw"])
def test_media_features_cover_tiff(spark, fmt):
    from nlp_series_relation_extraction_spark.functions.multimodal import (
        extract_features,
        image_features,
        synthesize_media,
    )

    docs = spark.createDataFrame(
        [(i, f"text number {i} with some words") for i in range(8)],
        "doc_id long, text string",
    )
    media = synthesize_media(docs, "doc_id", "text", formats=(fmt,))
    rows = extract_features(media).collect()
    assert len(rows) == 8
    assert all(r.n_bytes > 0 for r in rows)
    # features come from the REAL decode path (not the fake fallback):
    # recompute from the decoded payload and compare exactly
    payload = {r.media_id: r.content for r in media.collect()}
    for r in rows:
        want = image_features(decode_image(payload[r.media_id], fmt))
        assert np.allclose(r.features, want)


def test_corrupt_deflate_strip_raises_valueerror():
    """zlib errors from corrupt deflate strips convert to ValueError so
    the multimodal fallback catches them (pipeline stays total)."""
    a = _img(8, 8)
    enc = bytearray(encode_image_tiff(a, compression="deflate"))
    enc[-10] ^= 0xFF  # corrupt inside the strip data
    with pytest.raises(ValueError, match="deflate"):
        decode_image_tiff(bytes(enc))


def test_decoded_array_is_fresh_and_writable():
    """decode_image_tiff must hand back a writable array that does not
    pin the source buffer (parity with the png/jpeg decoders)."""
    for kw in ({}, {"compression": "lzw"}, {"compression": "packbits"}):
        out = decode_image_tiff(encode_image_tiff(_img(6, 7), **kw))
        assert out.flags.writeable
        assert out.base is None
        out[0, 0, 0] = 1  # in-place math must not raise


def test_packbits_packets_never_span_row_boundaries():
    """TIFF 6.0 §9: with RowsPerStrip > 1 each row is compressed
    independently — a strict row-at-a-time reader must be able to decode
    exactly row_bytes and land on a packet boundary. A solid-color image
    (maximal runs) would tempt a whole-strip encoder to emit one run
    packet spanning all rows."""
    import numpy as np

    from nlp_series_relation_extraction_spark.functions.tiff import (
        decode_image_tiff,
        encode_image_tiff,
    )

    a = np.full((8, 9, 3), 200, dtype=np.uint8)  # uniform: worst case
    a[3, 4] = (1, 2, 3)
    b = encode_image_tiff(a, rows_per_strip=4, compression="packbits")
    assert (decode_image_tiff(b) == a).all()

    # strict per-row walk over each strip's packet stream
    import struct

    e = "<"
    # locate strip offsets/counts from the IFD (tags 273/279)
    n_tags = struct.unpack_from(e + "H", b, 8)[0]
    tags = {}
    for i in range(n_tags):
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, 10 + i * 12)
        val = struct.unpack_from(e + "I", b, 10 + i * 12 + 8)[0]
        tags[tag] = (typ, cnt, val)
    _, n_strips, so = tags[273]
    _, _, sc = tags[279]
    offs = [struct.unpack_from(e + "I", b, so + 4 * k)[0] for k in range(n_strips)]
    cnts = [struct.unpack_from(e + "I", b, sc + 4 * k)[0] for k in range(n_strips)]
    row_bytes = 9 * 3
    # replaying the packet stream row by row, every row's decode must end
    # exactly on a packet boundary (no packet crosses a row)
    for off, cnt in zip(offs, cnts):
        strip = b[off : off + cnt]
        pos = 0
        while pos < len(strip):
            row_left = row_bytes
            while row_left > 0:
                ctrl = strip[pos]
                if ctrl < 128:
                    take = ctrl + 1
                    pos += 1 + take
                elif ctrl > 128:
                    take = 257 - ctrl
                    pos += 2
                else:
                    pos += 1
                    continue
                assert take <= row_left, "packet spans a row boundary"
                row_left -= take


# --- tiled layout + BigTIFF ---------------------------------------------------


def _libtiff_ref():
    try:
        from tests import tiff_ref
    except ImportError:
        import tiff_ref
    return tiff_ref if tiff_ref.LIB is not None else None


def test_bigtiff_handcrafted_uncompressed():
    """Hand-built minimal BigTIFF (magic 43, 8-byte offsets, 20-byte IFD
    entries, LONG8 tag values) decodes exactly."""
    import struct

    img = _img(5, 7)
    e = "<"
    raster = img.tobytes()
    # header(16) + IFD: count(8) + 8 entries * 20 + next(8)
    n_tags = 8
    ifd_off = 16
    data_off = ifd_off + 8 + n_tags * 20 + 8
    bits_off = data_off + len(raster)

    def entry(tag, typ, count, value):
        return struct.pack(e + "HHQ", tag, typ, count) + value

    def v8(v):
        return struct.pack(e + "Q", v)

    entries = [
        entry(256, 16, 1, v8(7)),            # width (LONG8)
        entry(257, 16, 1, v8(5)),            # height
        entry(258, 3, 3, struct.pack(e + "HHH", 8, 8, 8) + b"\0\0"),
        entry(259, 3, 1, struct.pack(e + "H", 1) + b"\0" * 6),
        entry(262, 3, 1, struct.pack(e + "H", 2) + b"\0" * 6),
        entry(273, 16, 1, v8(data_off)),     # strip offset
        entry(277, 3, 1, struct.pack(e + "H", 3) + b"\0" * 6),
        entry(279, 16, 1, v8(len(raster))),  # strip byte count
    ]
    out = b"II" + struct.pack(e + "HHH", 43, 8, 0) + struct.pack(e + "Q", 16)
    out += struct.pack(e + "Q", n_tags)
    for ent in entries:
        out += ent
    out += struct.pack(e + "Q", 0)
    out += raster
    assert (decode_image_tiff(out) == img).all()


@pytest.mark.parametrize("compression", ["none", "lzw", "deflate", "packbits"])
def test_tiled_tiff_from_libtiff(compression):
    ref = _libtiff_ref()
    if ref is None:
        pytest.skip("system libtiff not available")
    img = _img(40, 56, seed=5)
    data = ref.write_tiff(img, compression=compression, tiled=(16, 16))
    assert (decode_image_tiff(data) == img).all(), compression


def test_tiled_lzw_predictor_from_libtiff():
    ref = _libtiff_ref()
    if ref is None:
        pytest.skip("system libtiff not available")
    img = _img(33, 47, seed=6)  # non-multiple of the tile grid
    data = ref.write_tiff(img, compression="lzw", predictor=2, tiled=(16, 32))
    assert (decode_image_tiff(data) == img).all()


def test_bigtiff_from_libtiff():
    ref = _libtiff_ref()
    if ref is None:
        pytest.skip("system libtiff not available")
    img = _img(21, 34, seed=7)
    data = ref.write_tiff(img, compression="lzw", bigtiff=True)
    assert data[2:4] == b"\x2b\x00"  # magic 43
    assert (decode_image_tiff(data) == img).all()


def test_bigtiff_tiled_combined():
    ref = _libtiff_ref()
    if ref is None:
        pytest.skip("system libtiff not available")
    img = _img(40, 40, seed=8)
    data = ref.write_tiff(
        img, compression="deflate", predictor=2, tiled=(16, 16), bigtiff=True
    )
    assert (decode_image_tiff(data) == img).all()


def test_lzw_width_boundaries_interop_with_libtiff():
    """The early-change width schedule must match libtiff EXACTLY past
    the 511/1023/2047 table boundaries (a self-consistent off-by-one
    here decoded our own files but not the world's): a large noise image
    crosses all three boundaries; both directions must be pixel-exact."""
    ref = _libtiff_ref()
    if ref is None:
        pytest.skip("system libtiff not available")
    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, (80, 120, 3), dtype=np.uint8)
    # libtiff writes (single big strips force long LZW streams) -> we read
    data = ref.write_tiff(img, compression="lzw")
    assert (decode_image_tiff(data) == img).all()
    # we write -> libtiff reads
    mine = encode_image_tiff(img, compression="lzw")
    assert (ref.read_rgb(mine, 120, 80) == img).all()
    # and with the horizontal predictor on both sides
    data2 = ref.write_tiff(img, compression="lzw", predictor=2)
    assert (decode_image_tiff(data2) == img).all()
    mine2 = encode_image_tiff(img, compression="lzw", predictor=2)
    assert (ref.read_rgb(mine2, 120, 80) == img).all()
