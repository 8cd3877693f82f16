"""New-style JPEG-in-TIFF (TIFF TTN2, compression 7) tests.

Own-codec roundtrips are self-contained; external conformance is pinned
both ways against the system libtiff when available: (1) my decoder
reads libtiff-written JPEG-in-TIFF, (2) libtiff reads my encoder's
output, with per-pixel tolerance covering the JPEG-standard-permitted
IDCT implementation spread (max diff <= 8).

Reference: zhoujx4/NLP-Series-relation-extraction has no image path;
this closes the JPEG-in-TIFF item from the codec-residue list for the
multimodal pipeline columns.
"""

from __future__ import annotations

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions.tiff import (
    _merge_jpeg_tables,
    _split_jpeg_tables,
    decode_image_tiff,
    encode_image_tiff_jpeg,
)
from nlp_series_relation_extraction_spark.functions.multimodal import decode_image

try:
    from tests import tiff_ref
except ImportError:
    import tiff_ref

needs_libtiff = pytest.mark.skipif(
    tiff_ref.LIB is None, reason="system libtiff not available"
)


def _img(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(yy * 3 + 20) % 200, (xx * 2 + 80) % 200, (xx + yy) % 200], -1
    ).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / mse) if mse else float("inf")


def test_split_merge_tables_roundtrip():
    """Abbreviation is lossless plumbing: split + merge reproduces a
    stream that decodes identically to the original."""
    from nlp_series_relation_extraction_spark.functions.jpeg import (
        decode_image_jpeg,
        encode_image_jpeg,
    )

    full = encode_image_jpeg(_img(24, 32), quality=90, subsampling="420")
    tables, abbrev = _split_jpeg_tables(full)
    assert tables[:2] == b"\xff\xd8" and tables[-2:] == b"\xff\xd9"
    assert b"\xff\xdb" in tables and b"\xff\xc4" in tables  # DQT + DHT
    assert b"\xff\xdb" not in abbrev and b"\xff\xc4" not in abbrev
    merged = _merge_jpeg_tables(tables, abbrev)
    assert (decode_image_jpeg(merged) == decode_image_jpeg(full)).all()


@pytest.mark.parametrize("rps", [None, 16, 8])
def test_own_roundtrip_psnr(rps):
    img = _img(45, 37)
    enc = encode_image_tiff_jpeg(img, quality=92, rows_per_strip=rps)
    dec = decode_image_tiff(enc)
    assert dec.shape == img.shape
    assert _psnr(img, dec) > 28.0


def test_strips_are_abbreviated_with_shared_tables():
    from nlp_series_relation_extraction_spark.functions.jpeg import (
        encode_image_jpeg,
    )

    img = _img(40, 32)
    enc = encode_image_tiff_jpeg(img, quality=90, rows_per_strip=16)
    # one full encode carries N DQT + M DHT segments; with 3 strips an
    # unabbreviated layout would repeat them 3x. The TTN2 file holds
    # exactly ONE shared copy (in the JPEGTables payload). FF DB / FF C4
    # cannot occur inside entropy data (FF is byte-stuffed), so the
    # whole-file count is exact.
    one = encode_image_jpeg(img[:16], quality=90, subsampling="420")
    assert enc.count(b"\xff\xdb") == one.count(b"\xff\xdb")
    assert enc.count(b"\xff\xc4") == one.count(b"\xff\xc4")


def test_dispatches_via_multimodal():
    img = _img(24, 24)
    enc = encode_image_tiff_jpeg(img, quality=95)
    out = decode_image(enc, "image/tiff-jpeg")
    assert out.shape == img.shape and _psnr(img, out) > 28.0


@needs_libtiff
def test_decode_libtiff_written_file():
    img = _img(40, 56)
    data = tiff_ref.write_jpeg_tiff(img, quality=92, rows_per_strip=16)
    mine = decode_image_tiff(data)
    assert mine.shape == img.shape
    ref = tiff_ref.read_rgb(data, 56, 40)
    # same JPEG stream, different IDCTs: the standard permits small
    # per-sample spread
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 8
    assert _psnr(img, mine) > 28.0


@needs_libtiff
def test_libtiff_reads_my_encoder_output():
    img = _img(40, 56)
    enc = encode_image_tiff_jpeg(img, quality=92, rows_per_strip=16)
    ref = tiff_ref.read_rgb(enc, 56, 40)  # raises if libtiff rejects it
    mine = decode_image_tiff(enc)
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 8
