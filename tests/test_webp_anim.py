"""Animated WebP (VP8X/ANIM/ANMF) + ALPH alpha-plane tests.

The frame codecs are already conformance-pinned (test_vp8.py bit-exact
lossy, test_vp8l.py byte-exact lossless); what these tests pin is the
container layer: ALPH decode (alpha plane EXACT vs libwebp for
libwebp-encoded lossy+alpha stills — exercising its adaptive filters
and VP8L-compressed planes), the spec compositing rules (blend /
no-blend, dispose-to-background, sub-canvas frame rects, halved
offsets), and the muxer whose output our own decoder and compositing
round-trip. Lossless-frame animations are built from libwebp-encoded
VP8L chunks so compositing is checked on EXACT pixels.
"""

from __future__ import annotations

import ctypes

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions import vp8

try:
    from tests import webp_ref
except ImportError:
    import webp_ref

needs_libwebp = pytest.mark.skipif(
    webp_ref.LIB is None, reason="system libwebp not available"
)

_RNG = np.random.default_rng(21)


def _chunk(fourcc: bytes, body: bytes) -> bytes:
    import struct

    return (
        fourcc + struct.pack("<I", len(body)) + body
        + (b"\x00" if len(body) & 1 else b"")
    )


# --- ALPH -------------------------------------------------------------------


def test_alpha_unfilter_inverts_forward_filters():
    """Forward-filter a plane per the spec's prediction rules, then
    assert _alpha_unfilter restores it exactly, for all three filters."""
    plane = _RNG.integers(0, 256, (9, 13), dtype=np.uint8)
    h, w = plane.shape

    def fwd(p, method):
        out = p.astype(np.int64).copy()
        res = np.zeros_like(out)
        for y in range(h):
            for x in range(w):
                if method == 1:
                    pred = out[y, x - 1] if x else (out[y - 1, 0] if y else 0)
                elif method == 2:
                    pred = (
                        out[y - 1, x] if y else (out[0, x - 1] if x else 0)
                    )
                else:
                    if y == 0:
                        pred = out[0, x - 1] if x else 0
                    elif x == 0:
                        pred = out[y - 1, 0]
                    else:
                        g = (
                            int(out[y, x - 1])
                            + int(out[y - 1, x])
                            - int(out[y - 1, x - 1])
                        )
                        pred = min(255, max(0, g))
                res[y, x] = (out[y, x] - pred) & 0xFF
        return res.astype(np.uint8)

    for method in (1, 2, 3):
        filtered = fwd(plane, method)
        back = vp8._alpha_unfilter(filtered, method)
        assert (back == plane).all(), method


@needs_libwebp
def test_lossy_alpha_still_alpha_exact_vs_libwebp():
    """libwebp-encoded lossy RGBA: the ALPH-decoded alpha plane must be
    byte-exact vs WebPDecodeRGBA, the YUV planes bit-exact (RGB differs
    only by the documented upsampling/colorspace liberty)."""
    lib = webp_ref.LIB
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    for seed in (21, 22, 23):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (40, 56, 4), dtype=np.uint8)
        img[..., 3] = np.where(rng.random((40, 56)) < 0.3, 0, img[..., 3])
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeRGBA(
            np.ascontiguousarray(img).tobytes(), 56, 40, 56 * 4, 80.0,
            ctypes.byref(out),
        )
        data = ctypes.string_at(out, n)
        lib.WebPFree(out)
        assert b"ALPH" in data
        mine = vp8.decode_webp_rgba(data)
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = lib.WebPDecodeRGBA(
            data, len(data), ctypes.byref(w), ctypes.byref(h)
        )
        ref = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
        lib.WebPFree(p)
        assert (mine[..., 3] == ref[..., 3]).all(), seed
        Ym, Um, Vm = vp8.decode_webp_yuv(data)
        Yr, Ur, Vr = webp_ref.decode_yuv(data)
        assert (Ym == Yr).all() and (Um == Ur).all() and (Vm == Vr).all()


# --- animation --------------------------------------------------------------


def test_animation_muxer_roundtrip_fullframe():
    frames = [
        _RNG.integers(0, 256, (32, 48, 3), dtype=np.uint8) for _ in range(3)
    ]
    anim = vp8.encode_webp_animation(frames, [100, 200, 300], quality=85.0)
    dec, durs = vp8.decode_webp_animation(anim)
    assert dec.shape == (3, 32, 48, 4) and durs == [100, 200, 300]
    for i, f in enumerate(frames):
        still = vp8.decode_image_webp(vp8.encode_image_webp(f, 85.0))
        assert (dec[i][..., :3] == still).all(), i
        assert (dec[i][..., 3] == 255).all()


def test_animation_positioned_frames_and_dispose():
    """Frame 1 is a sub-rect at an offset; frame 2 checks that
    dispose-to-background cleared frame 1's rect to transparent."""
    base = np.full((32, 48, 3), 200, np.uint8)
    patch = np.full((8, 16, 3), 40, np.uint8)
    anim = vp8.encode_webp_animation(
        [base, patch, patch],
        [50, 50, 50],
        quality=95.0,
        offsets=[(0, 0), (16, 8), (16, 8)],
        no_blend=[True, True, True],
        dispose_bg=[False, True, False],
    )
    dec, _ = vp8.decode_webp_animation(anim)
    base_dec = vp8.decode_image_webp(vp8.encode_image_webp(base, 95.0))
    patch_dec = vp8.decode_image_webp(vp8.encode_image_webp(patch, 95.0))
    # frame 0: the base everywhere, opaque
    assert (dec[0][..., :3] == base_dec).all()
    # frame 1: patch over base at (x=16, y=8)
    exp = base_dec.copy()
    exp[8:16, 16:32] = patch_dec
    assert (dec[1][..., :3] == exp).all()
    # frame 2: the patch rect was DISPOSED to transparent after frame 1,
    # then frame 2 overwrote the same rect -> identical to frame 1 in
    # the rect, but the dispose must not leak outside it
    assert (dec[2][8:16, 16:32, :3] == patch_dec).all()
    assert (dec[2][..., 3] == 255).sum() >= (dec[1][..., 3] == 255).sum() - 8 * 16


@needs_libwebp
def test_animation_lossless_frames_exact_compositing():
    """Animation built from libwebp VP8L chunks (exact pixels): the
    composited canvases must equal numpy compositing of the sources."""
    import struct

    f0 = _RNG.integers(0, 256, (24, 30, 3), dtype=np.uint8)
    f1 = _RNG.integers(0, 256, (10, 12, 3), dtype=np.uint8)

    def vp8l_chunk(img):
        data = webp_ref.encode_lossless_rgb(img)
        for fourcc, body in vp8._walk_chunks(data):
            if fourcc == b"VP8L":
                return _chunk(b"VP8L", body)
        raise AssertionError("no VP8L chunk")

    def anmf(x, y, img, dur, flags):
        h, w = img.shape[:2]
        head = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (w - 1).to_bytes(3, "little")
            + (h - 1).to_bytes(3, "little")
            + dur.to_bytes(3, "little")
            + bytes([flags])
        )
        return _chunk(b"ANMF", head + vp8l_chunk(img))

    vp8x = bytes([0x02, 0, 0, 0]) + (29).to_bytes(3, "little") + (
        23
    ).to_bytes(3, "little")
    body = _chunk(b"VP8X", vp8x)
    body += _chunk(b"ANIM", struct.pack("<IH", 0, 0))
    body += anmf(0, 0, f0, 40, 0x02)  # no-blend full frame
    body += anmf(8, 6, f1, 40, 0x02)  # no-blend positioned overwrite
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    dec, durs = vp8.decode_webp_animation(data)
    assert durs == [40, 40]
    assert (dec[0][..., :3] == f0).all() and (dec[0][..., 3] == 255).all()
    exp = f0.copy()
    exp[6:16, 8:20] = f1
    assert (dec[1][..., :3] == exp).all()


def test_decode_image_first_frame_and_dispatch(spark=None):
    from nlp_series_relation_extraction_spark.functions.multimodal import (
        decode_image,
    )

    frames = [
        _RNG.integers(0, 256, (16, 16, 3), dtype=np.uint8) for _ in range(2)
    ]
    anim = vp8.encode_webp_animation(frames, [10, 10], quality=90.0)
    first = decode_image(anim, "video/webp-anim")
    still = vp8.decode_image_webp(vp8.encode_image_webp(frames[0], 90.0))
    assert (first == still).all()
    # image/webp on an animated container also yields the first frame
    assert (decode_image(anim, "image/webp") == still).all()


def test_frame_extract_animated_webp(spark):
    from nlp_series_relation_extraction_spark.functions.multimodal import (
        decode_image,
        frame_extract,
        synthesize_video,
    )

    docs = spark.createDataFrame(
        [(0, "first doc"), (1, "second doc")], "doc_id long, text string"
    )
    media = synthesize_video(
        docs, "doc_id", "text", n_frames=4, container="webp-anim"
    )
    rows = frame_extract(media, every_n=2).collect()
    # 2 media x frames {0, 2}
    assert sorted((r.media_id, r.frame_idx) for r in rows) == [
        (0, 0), (0, 2), (1, 0), (1, 2),
    ]
    for r in rows:
        img = decode_image(bytes(r.frame), "image/ppm")
        assert img.shape == (6, 8, 3)
