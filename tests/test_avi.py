"""AVI/MJPEG container tests (functions/avi.py).

The codec layer (functions/jpeg.py) is pinned bit-exact against libjpeg
in test_jpeg.py, so the container adds NO loss of its own: decoding an
AVI frame must equal decoding the identically-encoded standalone JPEG,
byte for byte. The container framing itself is pinned against the public
AVI RIFF spec with byte-level header asserts (fourccs, sizes, field
offsets), plus the spec's interop corners: WORD alignment of odd-length
chunks, '00db' naming, 'rec ' sub-lists, optional/consistent idx1.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions import avi as A
from nlp_series_relation_extraction_spark.functions.jpeg import (
    decode_image_jpeg,
    encode_image_jpeg,
)
from nlp_series_relation_extraction_spark.functions.multimodal import (
    decode_image,
)

_RNG = np.random.default_rng(47)


def _frames(n=4, h=24, w=32, seed=47):
    rng = np.random.default_rng(seed)
    base = (rng.integers(0, 256, size=(h, w, 3))).astype(np.uint8)
    # smooth gradient + moving block: compressible but frame-distinct
    out = []
    for k in range(n):
        f = base.copy()
        f[:, : (k + 1) * 4, 0] = 255 - 40 * k
        out.append(f)
    return out


class TestContainerBytes:
    def test_header_layout_matches_spec(self):
        frames = _frames(3)
        data = A.encode_video_avi_mjpeg(frames, fps=10, quality=85)
        assert data[:4] == b"RIFF"
        assert struct.unpack("<I", data[4:8])[0] == len(data) - 8
        assert data[8:12] == b"AVI "
        # first list is hdrl; its first chunk is a 56-byte avih
        assert data[12:16] == b"LIST" and data[20:24] == b"hdrl"
        assert data[24:28] == b"avih"
        assert struct.unpack("<I", data[28:32])[0] == 56
        avih = struct.unpack("<14I", data[32:88])
        assert avih[0] == 100_000          # dwMicroSecPerFrame at fps 10
        assert avih[3] & A.AVIF_HASINDEX   # dwFlags
        assert avih[4] == 3                # dwTotalFrames
        assert avih[6] == 1                # dwStreams
        assert (avih[8], avih[9]) == (32, 24)
        # strl: strh is 56 bytes, fccType/handler, rate/scale = fps
        i = data.index(b"strh")
        assert struct.unpack("<I", data[i + 4 : i + 8])[0] == 56
        assert data[i + 8 : i + 16] == b"vidsMJPG"
        scale, rate = struct.unpack("<II", data[i + 28 : i + 36])
        assert (scale, rate) == (1, 10)
        # strf: BITMAPINFOHEADER with biCompression 'MJPG'
        j = data.index(b"strf")
        assert struct.unpack("<I", data[j + 8 : j + 12])[0] == 40  # biSize
        assert data[j + 24 : j + 28] == b"MJPG"

    def test_chunks_word_aligned_with_odd_jpeg(self):
        # find a frame set whose first JPEG has odd length, then check the
        # pad byte is emitted and not counted, and the file still parses
        for seed in range(200):
            frames = _frames(2, seed=seed)
            j0 = encode_image_jpeg(frames[0], quality=85)
            if len(j0) & 1:
                break
        else:
            pytest.fail("no odd-length JPEG found in 200 seeds")
        data = A.encode_video_avi_mjpeg(frames, quality=85)
        i = data.index(b"00dc")
        ln = struct.unpack("<I", data[i + 4 : i + 8])[0]
        assert ln == len(j0) and ln & 1
        # next chunk fourcc starts at the word-aligned offset
        nxt = data[i + 8 + ln + 1 : i + 8 + ln + 5]
        assert nxt == b"00dc"
        out, fps, info = A.decode_avi_mjpeg(data)
        assert info["n_frames"] == 2 and fps == 10

    def test_idx1_consistent_and_checked(self):
        frames = _frames(3)
        data = bytearray(A.encode_video_avi_mjpeg(frames))
        # corrupt the first idx1 length field -> reader must refuse
        i = bytes(data).index(b"idx1")
        struct.pack_into("<I", data, i + 8 + 12, 1)
        with pytest.raises(ValueError, match="idx1"):
            A.decode_avi_mjpeg(bytes(data))

    def test_total_frames_cross_checked(self):
        frames = _frames(2)
        data = bytearray(A.encode_video_avi_mjpeg(frames))
        struct.pack_into("<I", data, 32 + 16, 7)  # avih dwTotalFrames
        with pytest.raises(ValueError, match="frames"):
            A.decode_avi_mjpeg(bytes(data))

    def test_non_mjpeg_handler_raises_pointedly(self):
        frames = _frames(1)
        data = A.encode_video_avi_mjpeg(frames)
        data = data.replace(b"vidsMJPG", b"vidsH264", 1)
        with pytest.raises(NotImplementedError, match="H264"):
            A.decode_avi_mjpeg(data)

    def test_00db_alias_and_rec_list_accepted(self):
        # rewrap each frame chunk as '00db' inside a 'rec ' list — both
        # spellings are legal per the spec and common in the wild
        frames = _frames(2)
        jpegs = [encode_image_jpeg(f, quality=85) for f in frames]
        chunks = b"".join(A._chunk(b"00db", j) for j in jpegs)
        movi = A._list(b"movi", A._list(b"rec ", chunks))
        ref = A.encode_video_avi_mjpeg(frames, quality=85)
        # rebuild: keep hdrl, swap movi, drop idx1 (optional per spec)
        i_movi = ref.index(b"movi") - 8
        hdr = ref[12:i_movi]
        payload = b"AVI " + hdr + movi
        data = b"RIFF" + struct.pack("<I", len(payload)) + payload
        out, fps, info = A.decode_avi_mjpeg(data)
        assert info["n_frames"] == 2
        for got, j in zip(out, jpegs):
            np.testing.assert_array_equal(got, decode_image_jpeg(j))


class TestFrames:
    def test_container_adds_no_loss(self):
        frames = _frames(4)
        data = A.encode_video_avi_mjpeg(frames, quality=85)
        out, fps, info = A.decode_avi_mjpeg(data)
        assert len(out) == 4 and fps == 10
        for k, f in enumerate(frames):
            want = decode_image_jpeg(encode_image_jpeg(f, quality=85))
            np.testing.assert_array_equal(out[k], want)

    def test_selective_decode_matches_full(self):
        frames = _frames(6)
        data = A.encode_video_avi_mjpeg(frames)
        full, _, _ = A.decode_avi_mjpeg(data)
        some, _, info = A.decode_avi_mjpeg(data, frame_indices=[0, 3, 5])
        assert info["n_frames"] == 6
        for got, want in zip(some, [full[0], full[3], full[5]]):
            np.testing.assert_array_equal(got, want)

    def test_frame_count_without_codec_work(self):
        frames = _frames(5)
        assert A.avi_frame_count(A.encode_video_avi_mjpeg(frames)) == 5

    def test_decode_image_first_frame_dispatch(self):
        frames = _frames(3)
        data = A.encode_video_avi_mjpeg(frames, quality=85)
        got = decode_image(data, "video/avi-mjpeg")
        want = decode_image_jpeg(encode_image_jpeg(frames[0], quality=85))
        np.testing.assert_array_equal(got, want)

    def test_empty_frames_rejected(self):
        with pytest.raises(ValueError, match="no frames"):
            A.encode_video_avi_mjpeg([])


class TestFusedVideoStats:
    def test_fused_equals_staged(self, spark):
        """The one-Arrow-pass driver path must reproduce the staged
        synthesize_video |> frame_extract |> decode-stats chain exactly
        for every container (AVI lossy-decode pixels included)."""
        import numpy as np

        from nlp_series_relation_extraction_spark.functions.multimodal import (
            _decode_ppm,
            frame_extract,
            synthesize_video,
            synthesize_video_frame_stats,
        )
        from pyspark.sql import functions as F

        docs = spark.createDataFrame(
            [(i, f"video clip {i}") for i in range(9)],
            "doc_id long, text string",
        )
        fused = {
            (r.media_id, r.frame_idx): (r.container, r.mean_r)
            for r in synthesize_video_frame_stats(
                docs, "doc_id", "text", n_frames=6, width=16, height=12,
                every_n=2,
            ).collect()
        }
        staged = {}
        for i, cont in enumerate(("avi-mjpeg", "gif-anim", "ppm-stack")):
            media = synthesize_video(
                docs.where(F.col("doc_id") % 3 == i), "doc_id", "text",
                n_frames=6, width=16, height=12, container=cont,
            )
            for r in frame_extract(media, every_n=2).collect():
                a = _decode_ppm(bytes(r.frame))
                staged[(r.media_id, r.frame_idx)] = (
                    cont, round(float(a[..., 0].mean()), 4)
                )
        assert fused == staged
        assert len(fused) == 9 * 3


class TestSparkPath:
    def test_synthesize_and_sample_avi(self, spark):
        from nlp_series_relation_extraction_spark.functions.multimodal import (
            _decode_ppm,
            frame_extract,
            synthesize_video,
        )

        docs = spark.createDataFrame(
            [(i, f"clip {i} pixels") for i in range(6)], "doc_id long, text string"
        )
        media = synthesize_video(
            docs, "doc_id", "text", n_frames=6, width=16, height=8,
            container="avi-mjpeg",
        )
        rows = media.collect()
        assert all(r.meta.format == "video/avi-mjpeg" for r in rows)
        sampled = frame_extract(media, every_n=2).collect()
        # 6 frames sampled every 2 -> indices 0, 2, 4 per clip
        assert sorted({r.frame_idx for r in sampled}) == [0, 2, 4]
        assert len(sampled) == 6 * 3
        # each sampled PPM frame equals the local selective decode
        payload = {r.media_id: bytes(r.content) for r in rows}
        for r in sampled[:6]:
            want, _, _ = A.decode_avi_mjpeg(
                payload[r.media_id], frame_indices=[r.frame_idx]
            )
            np.testing.assert_array_equal(_decode_ppm(bytes(r.frame)), want[0])
