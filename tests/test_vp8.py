"""VP8 (lossy WebP) codec tests.

Conformance contract: functions/vp8.py must decode libwebp-encoded
streams to the SAME Y/U/V planes as the system libwebp (bit-exact),
across content types (flat / gradient / noise / edges / photo-like),
frame shapes (including non-MB-aligned and 1x1), and qualities (which
drive segmentation, B_PRED density, and loop-filter strength through
libwebp's own encoder decisions). Skipped when libwebp is absent — the
pure-Python decoder itself has no runtime dependency on it.

Reference: the reference repo (zhoujx4/NLP-Series-relation-extraction)
has no image path; this extends the multimodal column support
(SURVEY.md's training-data-pipeline operators) with the highest-
frequency web image codec still missing after jpeg/png/tiff.
"""

from __future__ import annotations

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions import vp8
from nlp_series_relation_extraction_spark.functions.multimodal import decode_image

try:
    from tests import webp_ref
except ImportError:  # running from tests/ directly
    import webp_ref

needs_libwebp = pytest.mark.skipif(
    webp_ref.LIB is None, reason="system libwebp not available"
)

_RNG = np.random.default_rng(42)


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
    if kind == "edges":
        img = np.zeros((h, w, 3), np.uint8)
        img[::7] = 255
        img[:, ::5, 1] = 200
        img[h // 3 :, w // 2 :, 2] = 130
        return img
    base = (128 + 90 * np.sin(xx / 9.0) * np.cos(yy / 13.0)).astype(np.uint8)
    return np.stack([base, np.roll(base, 3, 1), np.roll(base, 5, 0)], -1)


# --- pure unit tests (no libwebp needed) ------------------------------------


def test_bool_coder_roundtrip():
    rng = np.random.default_rng(0)
    probs = rng.integers(1, 255, 500).tolist()
    bits = rng.integers(0, 2, 500).tolist()
    enc = vp8.BoolEncoder()
    for p, b in zip(probs, bits):
        enc.put(p, int(b))
    data = enc.finish()
    dec = vp8.BoolDecoder(data)
    got = [dec.get(p) for p in probs]
    assert got == [int(b) for b in bits]


def test_bool_coder_tree_roundtrip():
    enc = vp8.BoolEncoder()
    leaves = [0, 3, 1, 2, 4, 0, 3]
    for leaf in leaves:
        enc.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROBS, leaf)
    dec = vp8.BoolDecoder(enc.finish())
    got = [dec.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROBS) for _ in leaves]
    assert got == leaves


def test_fdct_idct_roundtrip_small_error():
    rng = np.random.default_rng(1)
    for _ in range(50):
        res = rng.integers(-255, 256, (4, 4))
        back = vp8.idct4x4(vp8.fdct4x4(res).astype(np.int64))
        assert np.abs(back - res).max() <= 2


def test_fwht_iwht_roundtrip_exact_enough():
    rng = np.random.default_rng(2)
    for _ in range(50):
        dcs = rng.integers(-2048, 2049, (4, 4))
        back = vp8.iwht4x4(vp8.fwht4x4(dcs).astype(np.int64))
        assert np.abs(back - dcs).max() <= 2


def test_container_rejects_non_webp():
    with pytest.raises(ValueError):
        vp8.decode_image_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        vp8.decode_image_webp(b"\x89PNG" + b"\x00" * 16)


def test_degenerate_animation_without_frames_rejected():
    # an animated container with an ANIM header but no ANMF frames has
    # nothing to decode; real animations decode via decode_webp_animation
    # (and through decode_image_webp as their first composited frame)
    anim = (
        b"RIFF" + (18).to_bytes(4, "little") + b"WEBP"
        + b"ANIM" + (6).to_bytes(4, "little") + b"\x00" * 6
    )
    with pytest.raises(ValueError, match="ANMF"):
        vp8.decode_image_webp(anim)


def test_vp8l_stream_has_no_yuv_planes():
    payload = b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
    payload += b"VP8L" + (8).to_bytes(4, "little") + b"\x2f" * 8
    with pytest.raises(ValueError, match="lossless"):
        vp8.decode_webp_yuv(payload)


def test_interframe_rejected():
    # frame tag with keyframe bit set to 1 (= interframe)
    frame = bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a" + b"\x00" * 16
    payload = (
        b"RIFF"
        + (len(frame) + 12).to_bytes(4, "little")
        + b"WEBP"
        + b"VP8 "
        + len(frame).to_bytes(4, "little")
        + frame
    )
    with pytest.raises(ValueError, match="key frame"):
        vp8.decode_image_webp(payload)


# --- libwebp conformance ----------------------------------------------------


@needs_libwebp
@pytest.mark.parametrize("kind", ["grad", "noise", "flat", "edges", "photo"])
def test_decode_bitexact_vs_libwebp_content(kind):
    img = _mkimg(96, 112, kind)
    for q in (10.0, 55.0, 92.0):
        data = webp_ref.encode_rgb(img, q)
        Yr, Ur, Vr = webp_ref.decode_yuv(data)
        Ym, Um, Vm = vp8.decode_webp_yuv(data)
        assert (Yr == Ym).all(), (kind, q, int((Yr != Ym).sum()))
        assert (Ur == Um).all(), (kind, q)
        assert (Vr == Vm).all(), (kind, q)


@needs_libwebp
@pytest.mark.parametrize(
    "shape", [(16, 16), (1, 1), (5, 17), (33, 47), (130, 258), (15, 16)]
)
def test_decode_bitexact_vs_libwebp_shapes(shape):
    h, w = shape
    img = _mkimg(h, w, "photo")
    data = webp_ref.encode_rgb(img, 60.0)
    Yr, Ur, Vr = webp_ref.decode_yuv(data)
    Ym, Um, Vm = vp8.decode_webp_yuv(data)
    assert (Yr == Ym).all() and (Ur == Um).all() and (Vr == Vm).all()


@needs_libwebp
def test_decode_image_webp_rgb_close_to_source():
    img = _mkimg(64, 48, "grad")
    data = webp_ref.encode_rgb(img, 95.0)
    out = decode_image(data, "image/webp")
    assert out.shape == (64, 48, 3) and out.dtype == np.uint8
    # lossy + chroma subsampling + BT.601 roundtrip: generous tolerance,
    # but must be recognizably the same image
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 12


@needs_libwebp
def test_multimodal_dispatch_webp():
    img = _mkimg(32, 32, "edges")
    data = webp_ref.encode_rgb(img, 80.0)
    out = decode_image(data, "webp")
    assert out.shape == (32, 32, 3)


# --- encoder ----------------------------------------------------------------


def test_encoder_decoder_roundtrip_close():
    """Self-contained (no libwebp): encode -> own decode tracks the
    source within lossy tolerance."""
    img = _mkimg(48, 40, "photo")
    data = vp8.encode_image_webp(img, quality=92.0)
    out = vp8.decode_image_webp(data)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 10


def test_encoder_quality_monotone_size():
    img = _mkimg(64, 64, "photo")
    sizes = [len(vp8.encode_image_webp(img, q)) for q in (20.0, 60.0, 95.0)]
    assert sizes == sorted(sizes)


@needs_libwebp
@pytest.mark.parametrize("kind", ["grad", "noise", "flat", "photo"])
def test_encoder_streams_decode_in_libwebp_bitexact(kind):
    """The encoder's output is a SPEC-VALID stream: libwebp decodes it,
    and to exactly the planes our decoder produces (= the encoder's
    in-loop reconstruction, since filter level is 0)."""
    for shape, q in [((33, 47), 30.0), ((64, 64), 75.0), ((5, 17), 95.0)]:
        img = _mkimg(*shape, kind)
        data = vp8.encode_image_webp(img, q)
        Yr, Ur, Vr = webp_ref.decode_yuv(data)
        Ym, Um, Vm = vp8.decode_webp_yuv(data)
        assert (Yr == Ym).all() and (Ur == Um).all() and (Vr == Vm).all()


@needs_libwebp
def test_encoder_quality_competitive_with_libwebp():
    """On a hard case (tiny extreme gradient) the reconstruction error
    must be in libwebp's own ballpark — guards against a silently
    degenerate mode decision or quantizer."""
    img = _mkimg(4, 4, "grad")
    mine = vp8.decode_image_webp(vp8.encode_image_webp(img, 95.0))
    ref = vp8.decode_image_webp(webp_ref.encode_rgb(img, 95.0))
    e_mine = np.abs(mine.astype(int) - img.astype(int)).mean()
    e_ref = np.abs(ref.astype(int) - img.astype(int)).mean()
    assert e_mine <= e_ref * 1.25 + 1.0
