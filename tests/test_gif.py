"""GIF codec tests (functions/gif.py).

GIF is lossless over indexed pixels, so the conformance pins are exact:
giflib decodes our files to the source pixels, our decoder reads
giflib-written files to the source pixels (both directions through a
compiled helper; skipped without gcc/libgif). Interlacing, animation
compositing (disposal + transparency), and the LZW variant's width
schedule are covered by constructed cases with hand-computable results.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions import gif as G
from nlp_series_relation_extraction_spark.functions.multimodal import decode_image

try:
    from tests import gif_ref
except ImportError:
    import gif_ref

needs_giflib = pytest.mark.skipif(
    not gif_ref.available(), reason="gcc + system giflib not available"
)

_RNG = np.random.default_rng(31)


def test_lzw_roundtrip_all_widths():
    for mcs in (2, 3, 4, 8):
        for n in (1, 17, 5000, 20000):
            data = _RNG.integers(0, 1 << mcs, n).astype(np.uint8).tobytes()
            assert G.gif_lzw_decode(G.gif_lzw_encode(data, mcs), mcs) == data


def test_lzw_rejects_corrupt_stream():
    with pytest.raises(ValueError, match="corrupt"):
        # code 300 right after clear is not a literal for mcs=2
        G.gif_lzw_decode(b"\xff\xff\xff\xff", 2)


def test_static_roundtrip_exact():
    pal = _RNG.integers(0, 256, (200, 3), dtype=np.uint8)
    img = pal[_RNG.integers(0, 200, (37, 53))]
    assert (G.decode_image_gif(G.encode_image_gif(img)) == img).all()


def test_quantization_kicks_in_above_256_colors():
    big = _RNG.integers(0, 256, (40, 40, 3), dtype=np.uint8)
    out = G.decode_image_gif(G.encode_image_gif(big))
    assert out.shape == big.shape
    assert np.abs(out.astype(int) - big.astype(int)).mean() < 25


def test_animation_roundtrip_and_durations():
    pal = _RNG.integers(0, 256, (64, 3), dtype=np.uint8)
    frames = [pal[_RNG.integers(0, 64, (16, 20))] for _ in range(3)]
    anim = G.encode_gif_animation(frames, [100, 200, 300])
    dec, durs = G.decode_gif_animation(anim)
    assert durs == [100, 200, 300]
    for i, f in enumerate(frames):
        assert (dec[i][..., :3] == f).all()
        assert (dec[i][..., 3] == 255).all()


def test_interlaced_decode():
    """Build an interlaced file by reordering rows per the 4-pass
    schedule and setting the interlace flag — decode must restore
    raster order."""
    pal = _RNG.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = _RNG.integers(0, 16, (13, 9)).astype(np.uint8)
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order += list(range(start, 13, step))
    shuffled = idx[order]
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", 9, 13) + bytes([0, 0, 0])
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, 9, 13)
    out += bytes([0x80 | 0x40 | 3])  # LCT size 16 + interlace
    out += pal.tobytes()
    out += bytes([4])
    lzw = G.gif_lzw_encode(shuffled.tobytes(), 4)
    for i in range(0, len(lzw), 255):
        c = lzw[i : i + 255]
        out += bytes([len(c)]) + c
    out += b"\x00\x3b"
    assert (G.decode_image_gif(bytes(out)) == pal[idx]).all()


def test_transparency_and_disposal_compositing():
    """Frame 2 paints a transparent-holed patch over frame 1; frame 3
    follows a dispose-to-background frame, so the patch rect is cleared."""
    pal = np.array([[250, 0, 0], [0, 250, 0], [0, 0, 250]], np.uint8)
    base_idx = np.zeros((8, 8), np.uint8)
    patch_idx = np.full((4, 4), 1, np.uint8)
    patch_idx[1:3, 1:3] = 2  # index 2 will be transparent

    def image_block(idx, left, top):
        out = bytearray()
        out += b"\x2c" + struct.pack(
            "<HHHH", left, top, idx.shape[1], idx.shape[0]
        )
        out += bytes([0x80 | 1])  # LCT of 4 entries
        table = np.zeros((4, 3), np.uint8)
        table[:3] = pal
        out += table.tobytes()
        out += bytes([2])
        lzw = G.gif_lzw_encode(idx.tobytes(), 2)
        out += bytes([len(lzw)]) + lzw + b"\x00"
        return bytes(out)

    def gce(disposal, transparent):
        flags = (disposal << 2) | (0x01 if transparent >= 0 else 0)
        return b"\x21\xf9\x04" + bytes([flags, 10, 0, max(transparent, 0)]) + b"\x00"

    data = b"GIF89a" + struct.pack("<HH", 8, 8) + bytes([0, 0, 0])
    data += gce(0, -1) + image_block(base_idx, 0, 0)
    data += gce(2, 2) + image_block(patch_idx, 2, 2)  # dispose-to-bg
    data += gce(0, -1) + image_block(base_idx[:2, :2], 0, 0)
    data += b"\x3b"
    frames, _ = G.decode_gif_animation(data)
    # frame 1: solid red
    assert (frames[0][..., :3] == pal[0]).all()
    # frame 2: green patch with a red hole (transparency preserved base)
    assert (frames[1][2:6, 2:6, :3][patch_idx == 1] == pal[1]).all()
    assert (frames[1][3:5, 3:5, :3] == pal[0]).all()
    # frame 3: the patch rect was disposed to transparent before it
    assert (frames[2][2:6, 2:6, 3] == 0).all()
    assert (frames[2][:2, :2, :3] == pal[0]).all()


@needs_giflib
def test_giflib_decodes_our_files_exactly():
    pal = _RNG.integers(0, 256, (200, 3), dtype=np.uint8)
    img = pal[_RNG.integers(0, 200, (37, 53))]
    frames = gif_ref.decode_frames(G.encode_image_gif(img))
    left, top, inter, gpal, idx = frames[0]
    assert (gpal[idx] == img).all() and not inter


@needs_giflib
def test_we_decode_giflib_files_exactly():
    pal = np.zeros((256, 3), np.uint8)
    pal[:200] = _RNG.integers(0, 256, (200, 3), dtype=np.uint8)
    indices = _RNG.integers(0, 200, (21, 33)).astype(np.uint8)
    data = gif_ref.encode_indexed(pal, indices)
    assert (G.decode_image_gif(data) == pal[indices]).all()


def test_multimodal_dispatch_gif():
    pal = _RNG.integers(0, 256, (32, 3), dtype=np.uint8)
    img = pal[_RNG.integers(0, 32, (12, 15))]
    assert (decode_image(G.encode_image_gif(img), "image/gif") == img).all()


def test_frame_extract_animated_gif(spark):
    from nlp_series_relation_extraction_spark.functions.multimodal import (
        decode_image,
        frame_extract,
        synthesize_video,
    )

    docs = spark.createDataFrame(
        [(0, "first doc"), (1, "second doc")], "doc_id long, text string"
    )
    media = synthesize_video(
        docs, "doc_id", "text", n_frames=4, container="gif-anim"
    )
    rows = frame_extract(media, every_n=2).collect()
    assert sorted((r.media_id, r.frame_idx) for r in rows) == [
        (0, 0), (0, 2), (1, 0), (1, 2),
    ]
    for r in rows:
        img = decode_image(bytes(r.frame), "image/ppm")
        assert img.shape == (6, 8, 3)
