"""VP8L (lossless WebP) decoder tests.

Lossless makes the conformance contract total: decoding a
libwebp-lossless-encoded stream must reproduce the SOURCE pixels
byte-for-byte (RGB). For RGBA, libwebp's default encoder may rewrite
the RGB of fully-transparent pixels (non-exact mode), so the RGBA pin
is against libwebp's own decode instead. Content types are chosen to
force each bitstream feature: palette images trigger color indexing
(incl. 1/2/4-bit pixel bundling), photo-like content triggers
predictor/color transforms and meta-Huffman groups, flat/text content
triggers LZ77 and the color cache. Skipped when libwebp is absent.

Reference: zhoujx4/NLP-Series-relation-extraction has no image path;
this completes WebP support for the multimodal pipeline columns.
"""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions import vp8l
from nlp_series_relation_extraction_spark.functions.multimodal import decode_image

try:
    from tests import webp_ref
except ImportError:
    import webp_ref

needs_libwebp = pytest.mark.skipif(
    webp_ref.LIB is None, reason="system libwebp not available"
)

_RNG = np.random.default_rng(11)


def _mkimg(h, w, kind):
    yy, xx = np.mgrid[0:h, 0:w]
    if kind == "grad":
        return np.stack(
            [
                xx * 255 // max(w - 1, 1),
                yy * 255 // max(h - 1, 1),
                (xx + yy) % 256,
            ],
            -1,
        ).astype(np.uint8)
    if kind == "noise":
        return _RNG.integers(0, 256, (h, w, 3), dtype=np.uint8)
    if kind == "flat":
        return np.full((h, w, 3), 77, np.uint8)
    if kind == "palette":
        pal = np.array(
            [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
        )
        return pal[_RNG.integers(0, 4, (h, w))]
    if kind == "palette2":
        pal = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
        return pal[_RNG.integers(0, 2, (h, w))]
    if kind == "text":
        img = np.full((h, w, 3), 240, np.uint8)
        img[::5] = 30
        img[:, ::9] = 60
        return img
    base = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 13.0)).astype(np.uint8)
    return np.stack([base, np.roll(base, 3, 1), np.roll(base, 5, 0)], -1)


def test_signature_and_version_checks():
    with pytest.raises(ValueError, match="signature"):
        vp8l.decode_vp8l_argb(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        vp8l.decode_image_webp_lossless(b"\x89PNG" + b"\x00" * 16)


def test_distance_map_matches_spec_construction():
    """The 120-entry 2D distance table equals its spec construction:
    window dy 0..7 / dx -7..8 minus the 8 non-causal dy==0, dx<=0
    offsets, ordered by squared distance, then dy desc, then dx desc."""
    cand = [
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if not (dy == 0 and dx <= 0)
    ]
    gen = sorted(cand, key=lambda p: (p[0] ** 2 + p[1] ** 2, -p[1], -p[0]))
    assert tuple(gen) == vp8l._DIST_MAP


@needs_libwebp
@pytest.mark.parametrize(
    "kind", ["grad", "noise", "flat", "palette", "palette2", "text", "photo"]
)
def test_lossless_roundtrip_exact_rgb(kind):
    for h, w in [(1, 1), (7, 5), (33, 47), (96, 112)]:
        img = _mkimg(h, w, kind)
        data = webp_ref.encode_lossless_rgb(img)
        out = vp8l.decode_image_webp_lossless(data)
        assert out.shape == img.shape and (out == img).all(), (kind, h, w)


@needs_libwebp
def test_lossless_rgba_matches_libwebp_decode():
    """Real alpha channel; compared against libwebp's own decode (the
    encoder may legally rewrite RGB under alpha=0 in non-exact mode)."""
    lib = webp_ref.LIB
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    img = _RNG.integers(0, 256, (33, 47, 4), dtype=np.uint8)
    data = webp_ref.encode_lossless_rgba(img)
    out = vp8l.decode_webp_lossless_rgba(data)
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGBA(data, len(data), ctypes.byref(w), ctypes.byref(h))
    ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
    lib.WebPFree(p)
    assert (out == ref).all()
    # and where alpha > 0, the source pixels survive exactly
    vis = img[:, :, 3] > 0
    assert (out[vis] == img[vis]).all()


@needs_libwebp
def test_multimodal_dispatch_sniffs_lossless():
    img = _mkimg(16, 16, "palette")
    data = webp_ref.encode_lossless_rgb(img)
    out = decode_image(data, "image/webp")
    assert (out == img).all()
