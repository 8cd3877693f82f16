"""Arithmetic-coded JPEG (SOF9) decoder tests.

The conformance pin is exact: libjpeg encodes the same pixels twice —
once Huffman (SOF0), once arithmetic (SOF9), same quality/subsampling —
and BOTH must decode through this package to byte-identical images (the
entropy layers must recover identical quantized coefficients; dequant/
IDCT/upsample/color-convert are shared code). Versus libjpeg's own
decode only the JPEG-permitted IDCT spread remains. Tests compile a
small C helper against the system libjpeg; skipped when gcc/jpeglib are
absent.

Reference: zhoujx4/NLP-Series-relation-extraction has no image path;
this closes the arithmetic-JPEG codec-residue item.
"""

from __future__ import annotations

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions import jpeg_arith
from nlp_series_relation_extraction_spark.functions.jpeg import decode_image_jpeg

try:
    from tests import jpeg_arith_ref
except ImportError:
    import jpeg_arith_ref

needs_libjpeg = pytest.mark.skipif(
    not jpeg_arith_ref.available(),
    reason="gcc + system libjpeg not available",
)

_RNG = np.random.default_rng(5)


def _mk(h, w, kind):
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "grad":
        return np.stack(
            [(yy * 5 + 20) % 256, (xx * 3 + 80) % 256, ((xx + yy) * 4) % 256],
            -1,
        ).astype(np.uint8)
    if kind == "noise":
        return _RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), 130, np.uint8)
    base = (128 + 90 * np.sin(xx / 7.0) * np.cos(yy / 11.0)).astype(np.uint8)
    return np.stack([base, np.roll(base, 2, 1), np.roll(base, 4, 0)], -1)


def test_qe_table_shape_and_fixed_state():
    """113 adaptive states + the non-adapting ~0.5 state; spot anchors
    from T.81 Table D.3."""
    assert len(jpeg_arith.QE_TABLE) == 114
    assert jpeg_arith.QE_TABLE[0] == (0x5A1D, 1, 1, 1)
    assert jpeg_arith.QE_TABLE[113] == (0x5A1D, 113, 113, 0)
    # every transition stays inside the table
    for qe, nl, nm, sw in jpeg_arith.QE_TABLE:
        assert 0 <= nl <= 113 and 0 <= nm <= 113 and sw in (0, 1)
        assert 0 < qe <= 0x5B12


@needs_libjpeg
def test_qe_table_matches_libjpeg_exactly():
    """The transcribed table equals libjpeg's jpeg_aritab (the normative
    T.81 Table D.3 data) entry for entry."""
    import ctypes

    try:
        lib = ctypes.CDLL("libjpeg.so.62")
        tab = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    except (OSError, ValueError):
        pytest.skip("jpeg_aritab not exported by this libjpeg build")
    for i, v in enumerate(tab):
        got = (
            (v >> 16) & 0xFFFF,
            v & 0x7F,
            (v >> 8) & 0xFF,
            (v >> 7) & 1,
        )
        assert got == jpeg_arith.QE_TABLE[i], i


@needs_libjpeg
@pytest.mark.parametrize("kind", ["grad", "noise", "flat", "photo"])
def test_arith_huffman_twins_decode_identically(kind):
    for (h, w), q, (hs, vs) in [
        ((24, 32), 85, (2, 2)),
        ((13, 17), 95, (1, 1)),
        ((33, 47), 30, (2, 1)),
        ((64, 48), 70, (2, 2)),
    ]:
        img = _mk(h, w, kind)
        a = jpeg_arith_ref.encode(img, q, arith=True, h_samp=hs, v_samp=vs)
        hf = jpeg_arith_ref.encode(img, q, arith=False, h_samp=hs, v_samp=vs)
        da = decode_image_jpeg(a)
        dh = decode_image_jpeg(hf)
        assert (da == dh).all(), (kind, h, w, q, hs, vs)


@needs_libjpeg
def test_arith_restart_intervals():
    img = _mk(40, 56, "photo")
    for rst in (1, 2, 7):
        a = jpeg_arith_ref.encode(img, 85, arith=True, restart=rst)
        hf = jpeg_arith_ref.encode(img, 85, arith=False, restart=rst)
        assert (decode_image_jpeg(a) == decode_image_jpeg(hf)).all(), rst


@needs_libjpeg
def test_arith_grayscale_twins():
    g = _RNG.integers(0, 256, (21, 19), dtype=np.uint8)
    a = jpeg_arith_ref.encode(g, 90, arith=True)
    hf = jpeg_arith_ref.encode(g, 90, arith=False)
    assert (decode_image_jpeg(a) == decode_image_jpeg(hf)).all()


@needs_libjpeg
def test_arith_vs_libjpeg_idct_spread_only():
    """4:4:4 so no chroma upsampling is involved (each decoder's
    upsampling filter is a liberty): what remains is the IDCT
    implementation spread, which must be small."""
    img = _mk(48, 64, "photo")
    a = jpeg_arith_ref.encode(img, 85, arith=True, h_samp=1, v_samp=1)
    mine = decode_image_jpeg(a)
    ref = jpeg_arith_ref.decode(a)
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 8


@needs_libjpeg
def test_arith_stream_is_smaller():
    """Sanity that the reference really exercises the arithmetic codec:
    SOF9 present and the stream beats its Huffman twin on size."""
    img = _mk(64, 64, "photo")
    a = jpeg_arith_ref.encode(img, 85, arith=True)
    hf = jpeg_arith_ref.encode(img, 85, arith=False)
    assert b"\xff\xc9" in a and b"\xff\xc0" in hf
    assert len(a) < len(hf)


# --- encoder ----------------------------------------------------------------


def test_own_encoder_twins_with_baseline():
    """Self-contained (no libjpeg): our SOF9 encoder writes the SAME
    quantized coefficients as our baseline encoder, so both must decode
    to identical pixels through our decoder — pinning encoder and
    decoder against each other."""
    from nlp_series_relation_extraction_spark.functions.jpeg import (
        encode_image_jpeg,
    )
    from nlp_series_relation_extraction_spark.functions.jpeg_arith import (
        encode_image_jpeg_arith,
    )

    for (h, w), q, sub in [
        ((24, 32), 85, "420"), ((13, 17), 95, "444"), ((33, 47), 30, "420"),
    ]:
        img = _RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
        ae = encode_image_jpeg_arith(img, q, sub)
        he = encode_image_jpeg(img, q, sub)
        assert b"\xff\xc9" in ae
        assert (decode_image_jpeg(ae) == decode_image_jpeg(he)).all()
        assert len(ae) < len(he)  # arithmetic coding must actually win


@needs_libjpeg
def test_libjpeg_decodes_our_arith_streams():
    """External validity: libjpeg accepts our SOF9 output and decodes it
    to the same pixels as our Huffman twin (its own IDCT both times, so
    equality is exact)."""
    from nlp_series_relation_extraction_spark.functions.jpeg import (
        encode_image_jpeg,
    )
    from nlp_series_relation_extraction_spark.functions.jpeg_arith import (
        encode_image_jpeg_arith,
    )

    img = _mk(33, 47, "photo")
    for q, sub in [(85, "420"), (95, "444")]:
        ae = encode_image_jpeg_arith(img, q, sub)
        he = encode_image_jpeg(img, q, sub)
        assert (jpeg_arith_ref.decode(ae) == jpeg_arith_ref.decode(he)).all()


def test_dispatches_via_multimodal():
    from nlp_series_relation_extraction_spark.functions.jpeg_arith import (
        encode_image_jpeg_arith,
    )
    from nlp_series_relation_extraction_spark.functions.multimodal import (
        decode_image,
    )

    img = _mk(16, 16, "grad")
    out = decode_image(
        encode_image_jpeg_arith(img, 95, "444"), "image/jpeg-arithmetic"
    )
    assert out.shape == img.shape
