"""FLAC codec tests (functions/flac.py).

FLAC is lossless, so every pin is EXACT equality — no perceptual
tolerance. No system libFLAC exists in this container, so beyond
roundtrips (which the TIFF-LZW lesson says are insufficient alone) the
suite pins independently-derivable vectors: Rice codings worked out by
hand, the published CRC-8(0x07)/CRC-16(0x8005) check values, UTF-8
frame numbers against Python's own UTF-8 encoder, and STREAMINFO fields
at spec bit offsets.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions import flac as FL

_RNG = np.random.default_rng(11)


def _tone(n=4000, freq=440, rate=16000, amp=3000):
    k = np.arange(n)
    return np.round(amp * np.sin(2 * np.pi * freq * k / rate)).astype(np.int16)


class TestSpecVectors:
    def test_crc8_check_value(self):
        # CRC-8 poly 0x07, init 0, unreflected: published check value
        assert FL.crc8(b"123456789") == 0xF4

    def test_crc16_check_value(self):
        # CRC-16/UMTS (poly 0x8005, init 0, unreflected): check 0xFEE8
        assert FL.crc16(b"123456789") == 0xFEE8

    def test_utf8_frame_numbers_match_python_utf8(self):
        # the spec's coded number IS UTF-8 for every scalar Python can
        # encode (surrogates excluded); the extension beyond U+10FFFF
        # only adds longer forms
        for n in [0, 1, 0x7F, 0x80, 0x7FF, 0x800, 0xFFF, 0xD7FF,
                  0xE000, 0xFFFF, 0x10000, 0x10FFFF]:
            assert FL._utf8_number(n) == chr(n).encode("utf-8"), hex(n)

    def test_utf8_roundtrip_beyond_unicode(self):
        for n in [0x110000, (1 << 31) - 1, (1 << 36) - 1]:
            br = FL._BitReader(FL._utf8_number(n))
            assert FL._read_utf8_number(br) == n

    def test_rice_partition_hand_vector(self):
        # residuals (0, -1, 1, -2) zigzag to (0, 1, 2, 3); with param 1:
        #   u=0: q=0 -> '1',  rem 0 -> '0'      => 10
        #   u=1: q=0 -> '1',  rem 1 -> '1'      => 11
        #   u=2: q=1 -> '01', rem 0 -> '0'      => 010
        #   u=3: q=1 -> '01', rem 1 -> '1'      => 011
        # stream: 0001 (param nibble) 10 11 010 011 + 2 pad zeros
        #       = 00011011 01001100 = 0x1B 0x4C
        bw = FL._BitWriter()
        FL._write_rice_partition(
            bw, np.array([0, -1, 1, -2]), param=1, escape_raw_bits=None
        )
        bw.align()
        assert bw.bytes() == bytes([0x1B, 0x4C])

    def test_zigzag_spec_mapping(self):
        x = np.array([0, -1, 1, -2, 2, -3])
        assert list(FL._zigzag(x)) == [0, 1, 2, 3, 4, 5]
        for u in range(6):
            assert FL._unzigzag(FL._zigzag(np.array([FL._unzigzag(u)]))[0]) \
                == FL._unzigzag(u)

    def test_streaminfo_fields_at_spec_offsets(self):
        pcm = _tone(3000)
        data = FL.encode_audio_flac(pcm, sample_rate=16000, block_size=1024)
        assert data[:4] == b"fLaC"
        assert data[4] == 0x80                       # last block, type 0
        assert int.from_bytes(data[5:8], "big") == 34
        si = data[8 : 8 + 34]
        assert int.from_bytes(si[0:2], "big") == 3000 % 1024  # min blocksize
        assert int.from_bytes(si[2:4], "big") == 1024         # max blocksize
        packed = int.from_bytes(si[10:18], "big")
        assert packed >> 44 == 16000                 # 20-bit sample rate
        assert (packed >> 41) & 0x7 == 0             # channels - 1
        assert (packed >> 36) & 0x1F == 15           # bps - 1
        assert packed & ((1 << 36) - 1) == 3000      # total samples
        assert si[18:34] == hashlib.md5(
            pcm[:, None].astype("<i2").tobytes()
        ).digest()

    def test_frame_sync_and_header_crc(self):
        data = FL.encode_audio_flac(_tone(500), block_size=256)
        i = 8 + 34
        assert data[i] == 0xFF and (data[i + 1] & 0xFC) == 0xF8
        # blocksize code 8 (=256) in the high nibble of byte 2
        assert data[i + 2] >> 4 == 8


class TestRoundtrip:
    @pytest.mark.parametrize("kwargs", [
        {},
        {"force_verbatim": True},
        {"force_escape": True},
        {"partition_order": 3},
        {"block_size": 192},
        {"block_size": 1000},   # code-7 explicit 16-bit blocksize
    ])
    def test_mono_exact(self, kwargs):
        pcm = (_tone(4096 + 17).astype(np.int64)
               + _RNG.integers(-50, 50, 4096 + 17)).clip(-32768, 32767)
        pcm = pcm.astype(np.int16)
        out, sr = FL.decode_audio_flac(FL.encode_audio_flac(pcm, 16000, **kwargs))
        assert sr == 16000
        np.testing.assert_array_equal(out[:, 0], pcm.astype(np.int32))

    @pytest.mark.parametrize("mid_side", [False, True])
    def test_stereo_exact(self, mid_side):
        l = _tone(3001, 440)
        r = (_tone(3001, 523).astype(np.int64)
             + _RNG.integers(-5, 5, 3001)).clip(-32768, 32767).astype(np.int16)
        pcm = np.stack([l, r], axis=1)
        out, _ = FL.decode_audio_flac(
            FL.encode_audio_flac(pcm, 44100, mid_side=mid_side)
        )
        np.testing.assert_array_equal(out, pcm.astype(np.int32))

    def test_extremes_and_constant(self):
        pcm = np.array([32767, -32768, 0, -1, 1] * 100, dtype=np.int16)
        out, _ = FL.decode_audio_flac(FL.encode_audio_flac(pcm))
        np.testing.assert_array_equal(out[:, 0], pcm.astype(np.int32))
        const = np.full(4096, -12345, dtype=np.int16)
        data = FL.encode_audio_flac(const)
        assert len(data) < 100  # CONSTANT subframe: the block costs bytes
        out, _ = FL.decode_audio_flac(data)
        np.testing.assert_array_equal(out[:, 0], const.astype(np.int32))

    def test_wasted_bits_path(self):
        pcm = (_RNG.integers(-256, 256, 2048) * 64).astype(np.int16)
        out, _ = FL.decode_audio_flac(FL.encode_audio_flac(pcm))
        np.testing.assert_array_equal(out[:, 0], pcm.astype(np.int32))

    def test_many_frames_utf8_numbers(self):
        pcm = _RNG.integers(-300, 300, 16 * 150).astype(np.int16)
        out, _ = FL.decode_audio_flac(FL.encode_audio_flac(pcm, block_size=16))
        np.testing.assert_array_equal(out[:, 0], pcm.astype(np.int32))

    def test_compression_actually_compresses(self):
        pcm = _tone(16000)
        flac = FL.encode_audio_flac(pcm)
        assert len(flac) < 0.7 * (2 * len(pcm))  # vs raw 16-bit PCM


class TestValidation:
    def test_frame_crc16_corruption_detected(self):
        data = bytearray(FL.encode_audio_flac(_tone(600), block_size=256))
        data[-40] ^= 0x01  # inside the last frame body
        with pytest.raises(ValueError, match="CRC-16"):
            FL.decode_audio_flac(bytes(data))

    def test_header_crc8_corruption_detected(self):
        data = bytearray(FL.encode_audio_flac(_tone(600), block_size=256))
        i = 8 + 34
        data[i + 2] ^= 0x10  # blocksize code bits in the frame header
        with pytest.raises(ValueError, match="CRC-8|sync|blocksize"):
            FL.decode_audio_flac(bytes(data))

    def test_md5_mismatch_detected(self):
        data = bytearray(FL.encode_audio_flac(_tone(600)))
        data[8 + 18] ^= 0xFF  # first MD5 byte in STREAMINFO
        with pytest.raises(ValueError, match="MD5"):
            FL.decode_audio_flac(bytes(data))

    def test_not_flac_rejected(self):
        with pytest.raises(ValueError, match="not a FLAC"):
            FL.decode_audio_flac(b"RIFFxxxxWAVE")


def _build_stream(subframe_writers, bs, n_ch, chan_code, expected):
    """Assemble a one-frame FLAC stream from raw subframe writers — used
    to pin decoder branches the repo's encoder never emits (LPC,
    left/side, right/side). ``expected`` [bs, n_ch] int is only used for
    the STREAMINFO MD5 so decode verification stays end-to-end."""
    import hashlib
    import struct

    si = FL._BitWriter()
    si.write(bs, 16)
    si.write(bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(16000, 20)
    si.write(n_ch - 1, 3)
    si.write(15, 5)  # 16 bps
    si.write(bs, 36)
    md5 = hashlib.md5(
        np.asarray(expected, dtype="<i2").tobytes()
    ).digest()
    header = (
        FL.FLAC_MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:]
        + si.bytes() + md5
    )
    bw = FL._BitWriter()
    bw.write(0b11111111111110, 14)
    bw.write(0, 2)
    bw.write(7, 4)               # 16-bit blocksize-1 follows
    bw.write(0, 4)               # rate from streaminfo
    bw.write(chan_code, 4)
    bw.write(0b100, 3)           # 16 bps
    bw.write(0, 1)
    bw.write(0, 8)               # frame number 0
    bw.write(bs - 1, 16)
    bw.align()
    bw.write(FL.crc8(bytes(bw.out)), 8)
    for writer in subframe_writers:
        writer(bw)
    bw.align()
    body = bw.bytes()
    return header + body + struct.pack(">H", FL.crc16(body))


class TestConstructedStreams:
    """Decoder branches the in-repo encoder never emits, pinned via
    hand-assembled streams + per-sample twins."""

    def test_lpc_subframe(self):
        # order-2 LPC, shift 10, coefs (1.5, -0.5) in Q10: the decoder
        # must reproduce x when residuals are built with the spec
        # recurrence res[i] = x[i] - ((c0*x[i-1] + c1*x[i-2]) >> shift)
        rng = np.random.default_rng(3)
        n = 512
        x = np.round(
            2000 * np.sin(2 * np.pi * 7 * np.arange(n) / n)
        ).astype(np.int64) + rng.integers(-20, 20, n)
        coefs = [1536, -512]
        shift = 10
        order = 2
        res = np.array([
            x[i] - ((coefs[0] * x[i - 1] + coefs[1] * x[i - 2]) >> shift)
            for i in range(order, n)
        ])

        def sub(bw):
            bw.write(0, 1)
            bw.write(32 + order - 1, 6)   # LPC, order 2
            bw.write(0, 1)                # no wasted bits
            for v in x[:order]:
                bw.write(int(v) & 0xFFFF, 16)
            bw.write(12 - 1, 4)           # precision 12
            bw.write(shift, 5)
            for c in coefs:
                bw.write(c & 0xFFF, 12)
            bw.write(0, 2)                # rice method 0
            bw.write(0, 4)                # partition order 0
            FL._write_rice_partition(bw, res, FL._rice_param(res), None)

        data = _build_stream([sub], n, 1, 0, x[:, None])
        out, sr = FL.decode_audio_flac(data)
        assert sr == 16000
        np.testing.assert_array_equal(out[:, 0], x)

    @pytest.mark.parametrize("chan_code", [8, 9])
    def test_left_side_and_right_side(self, chan_code):
        rng = np.random.default_rng(chan_code)
        n = 256
        l = rng.integers(-3000, 3000, n).astype(np.int64)
        r = l + rng.integers(-40, 40, n)  # correlated: side is small
        side = l - r

        def mk(vals, bps):
            def sub(bw):
                FL._encode_subframe(bw, np.asarray(vals), bps)
            return sub

        if chan_code == 8:    # left/side
            subs = [mk(l, 16), mk(side, 17)]
        else:                 # right/side
            subs = [mk(side, 17), mk(r, 16)]
        expected = np.stack([l, r], axis=1)
        data = _build_stream(subs, n, 2, chan_code, expected)
        out, _ = FL.decode_audio_flac(data)
        np.testing.assert_array_equal(out, expected)

    def test_rice2_method_partitions(self):
        # residual method 1 (5-bit rice2 params) — the decoder's other
        # residual path; the encoder always writes method 0
        rng = np.random.default_rng(9)
        n = 128
        x = rng.integers(-500, 500, n).astype(np.int64)

        def sub(bw):
            bw.write(0, 1)
            bw.write(8, 6)   # FIXED order 0 -> residual == x
            bw.write(0, 1)
            bw.write(1, 2)   # rice2
            bw.write(0, 4)   # partition order 0
            p = FL._rice_param(x)
            bw.write(p, 5)   # 5-bit parameter
            bw.write_rice_array(FL._zigzag(x), p)

        data = _build_stream([sub], n, 1, 0, x[:, None])
        out, _ = FL.decode_audio_flac(data)
        np.testing.assert_array_equal(out[:, 0], x)


class TestAudioIntegration:
    def test_decode_audio_sniffs_flac_equals_wav(self):
        from nlp_series_relation_extraction_spark.functions.audio import (
            decode_audio,
            encode_audio_wav,
        )

        pcm = _tone(2500)
        via_wav, r1 = decode_audio(encode_audio_wav(pcm, 16000))
        via_flac, r2 = decode_audio(FL.encode_audio_flac(pcm, 16000))
        assert r1 == r2 == 16000
        np.testing.assert_array_equal(via_wav, via_flac)

    def test_fused_flac_transport_equals_wav_features(self, spark):
        from nlp_series_relation_extraction_spark.functions.audio import (
            synthesize_audio_features,
        )

        docs = spark.createDataFrame(
            [(i, f"clip number {i} with text") for i in range(12)],
            "doc_id long, text string",
        )
        wav = synthesize_audio_features(docs, "doc_id", "text").collect()
        flc = synthesize_audio_features(
            docs, "doc_id", "text", transport="flac"
        ).collect()
        w = {r.media_id: r for r in wav}
        f = {r.media_id: r for r in flc}
        assert set(w) == set(f)
        for mid in w:
            # lossless: identical features; compressed: fewer bytes
            assert w[mid].features == f[mid].features
            assert f[mid].n_bytes < w[mid].n_bytes
            assert w[mid].n_samples == f[mid].n_samples

    def test_unknown_transport_rejected(self, spark):
        from nlp_series_relation_extraction_spark.functions.audio import (
            synthesize_audio_features,
        )

        docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError, match="transport"):
            synthesize_audio_features(docs, "doc_id", "text", transport="mp3")
