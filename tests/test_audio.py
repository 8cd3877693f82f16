"""Audio modality (functions/audio.py): WAV codec roundtrips, signal
features, and the Spark plumbing — completing the image/video/AUDIO
multimodal triple with the same verification pattern (lossless roundtrip +
Spark == local real decode + SQL-derivable metadata oracled separately)."""

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions.audio import (
    AUDIO_FEATURE_DIM,
    audio_features,
    decode_audio_wav,
    encode_audio_wav,
)


def test_wav_roundtrip_lossless_mono_and_stereo():
    rng = np.random.default_rng(5)
    mono = rng.integers(-32768, 32768, size=300, dtype=np.int16)
    samples, rate = decode_audio_wav(encode_audio_wav(mono, 8000))
    assert rate == 8000 and samples.shape == (300, 1)
    assert (np.round(samples[:, 0] * 32768.0).astype(np.int16) == mono).all()
    stereo = rng.integers(-32768, 32768, size=(200, 2), dtype=np.int16)
    samples, rate = decode_audio_wav(encode_audio_wav(stereo, 44100))
    assert rate == 44100 and samples.shape == (200, 2)
    assert (np.round(samples * 32768.0).astype(np.int16) == stereo).all()


def test_wav_decoder_skips_extra_riff_chunks():
    mono = np.arange(-50, 50, dtype=np.int16)
    enc = bytearray(encode_audio_wav(mono, 16000))
    # splice a LIST chunk between fmt and data (arbitrary-writer hardening)
    extra = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    spliced = bytes(enc[:36]) + extra + bytes(enc[36:])
    spliced = (
        spliced[:4]
        + (len(spliced) - 8).to_bytes(4, "little")
        + spliced[8:]
    )
    samples, rate = decode_audio_wav(spliced)
    assert (np.round(samples[:, 0] * 32768.0).astype(np.int16) == mono).all()


def test_wav_unsupported_variants_raise_pointedly():
    import struct

    mono = np.zeros(10, dtype=np.int16)
    enc = bytearray(encode_audio_wav(mono, 16000))
    bad = bytearray(enc)
    struct.pack_into("<H", bad, 20, 85)  # MPEG Layer-3 format tag
    with pytest.raises(NotImplementedError, match="perceptual"):
        decode_audio_wav(bytes(bad))
    bad = bytearray(enc)
    struct.pack_into("<H", bad, 34, 12)  # 12-bit depth (not a PCM width)
    with pytest.raises(NotImplementedError, match="12-bit"):
        decode_audio_wav(bytes(bad))
    with pytest.raises(ValueError, match="RIFF"):
        decode_audio_wav(b"not audio at all")


def test_audio_features_recover_planted_tone():
    """A pure 440 Hz tone: dominant-frequency feature lands on 440 and the
    RMS matches a sine's 1/sqrt(2) amplitude scaling."""
    rate, n = 16000, 16000
    k = np.arange(n)
    tone = (0.5 * np.sin(2 * np.pi * 440.0 * k / rate) * 32767).astype(
        np.int16
    )
    samples, r = decode_audio_wav(encode_audio_wav(tone, rate))
    f = audio_features(samples, r)
    assert f.shape == (AUDIO_FEATURE_DIM,)
    assert abs(f[3] - 440.0) < 1.5  # dominant Hz
    assert abs(f[0] - 0.5 / np.sqrt(2)) < 0.01  # RMS
    assert f[1] == pytest.approx(0.5, abs=0.01)  # peak


def test_spark_audio_features_equal_local_decode(spark):
    """Spark Arrow path == local decode->features composition; payloads are
    genuine WAVs whose synthesized tone frequency is recoverable."""
    from nlp_series_relation_extraction_spark.functions.audio import (
        extract_audio_features,
        synthesize_audio,
    )

    docs = spark.createDataFrame(
        [(i, f"clip number {i} " * (i + 1)) for i in range(6)],
        "doc_id long, text string",
    )
    audio = synthesize_audio(docs, "doc_id", "text")
    got = {
        r.media_id: (r.n_samples, r.n_bytes, np.asarray(r.features))
        for r in extract_audio_features(audio).collect()
    }
    payloads = {r.media_id: bytes(r.content) for r in audio.collect()}
    for mid, (n_samples, n_bytes, feats) in got.items():
        assert n_bytes == 44 + n_samples * 2  # PCM header arithmetic
        samples, rate = decode_audio_wav(payloads[mid])
        assert len(samples) == n_samples
        local = audio_features(samples, rate)
        assert np.allclose(feats, local)
    # null payload row -> zero features, no crash
    from pyspark.sql import functions as F

    nulls = audio.withColumn("content", F.lit(None).cast("binary"))
    nf = extract_audio_features(nulls).collect()
    assert all(sum(r.features) == 0 and r.n_bytes == 0 for r in nf)


def test_fused_equals_staged(spark):
    from nlp_series_relation_extraction_spark.functions.audio import (
        extract_audio_features,
        synthesize_audio,
        synthesize_audio_features,
    )

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "a much longer utterance here")],
        "doc_id long, text string",
    )
    staged = extract_audio_features(
        synthesize_audio(docs, "doc_id", "text")
    ).collect()
    fused = synthesize_audio_features(docs, "doc_id", "text").collect()
    s = {r.media_id: (r.n_samples, r.n_bytes, r.features) for r in staged}
    f = {r.media_id: (r.n_samples, r.n_bytes, r.features) for r in fused}
    assert s == f  # byte-identical synthesis -> identical features


# --- G.711 + IMA ADPCM (round-4: compressed-audio coverage) -------------------


def test_g711_involution_and_error_bounds():
    """A-law encode(decode(byte)) is the identity on all 256 codewords;
    mu-law likewise modulo the inherent +-0 ambiguity (byte 0x7F and
    0xFF both decode to 0). Companding error stays within the top-segment
    step size on random int16."""
    from nlp_series_relation_extraction_spark.functions.audio import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    b = np.arange(256, dtype=np.uint8)
    assert (alaw_encode(alaw_decode(b)) == b).all()
    assert (ulaw_decode(ulaw_encode(ulaw_decode(b))) == ulaw_decode(b)).all()
    rng = np.random.default_rng(1)
    x = rng.integers(-32768, 32768, 5000).astype(np.int16)
    assert np.abs(ulaw_decode(ulaw_encode(x)).astype(int) - x).max() <= 1024
    assert np.abs(alaw_decode(alaw_encode(x)).astype(int) - x).max() <= 1024


@pytest.mark.parametrize("codec,tag", [("ulaw", 7), ("alaw", 6), ("ima", 17)])
def test_compressed_wav_container_roundtrip(codec, tag):
    """Full WAV container roundtrip per codec: the fmt tag is right, the
    payload genuinely shrinks vs PCM, and the decoded tone stays faithful
    (SNR floor)."""
    import struct as _struct

    from nlp_series_relation_extraction_spark.functions.audio import (
        decode_audio_wav,
        encode_audio_wav,
    )

    n = 1600
    t = np.arange(n)
    pcm = (0.6 * np.sin(2 * np.pi * 440 * t / 16_000) * 32767).astype(
        np.int16
    )
    wav = encode_audio_wav(pcm, 16_000, codec=codec)
    # fmt tag sits at offset 20 in our writer's layout
    assert _struct.unpack("<H", wav[20:22])[0] == tag
    assert len(wav) < len(encode_audio_wav(pcm, 16_000)) * 0.6
    out, rate = decode_audio_wav(wav)
    assert rate == 16_000
    assert out.shape[0] == n  # fact chunk / byte counts preserve length
    ref = pcm.astype(np.float64) / 32768.0
    err = out[:, 0].astype(np.float64) - ref
    snr = 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-12))
    assert snr > 25.0, (codec, snr)


def test_ima_multi_block_and_partial_tail():
    """> 1 block (505 samples/block) with a non-block-aligned tail: the
    fact chunk trims the padding nibble's spurious sample."""
    from nlp_series_relation_extraction_spark.functions.audio import (
        decode_audio_wav,
        encode_audio_wav,
    )

    rng = np.random.default_rng(3)
    # smooth-ish signal (ADPCM tracks slopes, not white noise)
    sig = np.cumsum(rng.integers(-300, 301, 1300)).clip(-30000, 30000)
    pcm = sig.astype(np.int16)
    out, _ = decode_audio_wav(encode_audio_wav(pcm, 8_000, codec="ima"))
    assert out.shape[0] == 1300
    err = out[:, 0] * 32768.0 - pcm
    assert np.sqrt(np.mean(err**2)) < 600


def test_compressed_wav_through_feature_extraction(spark):
    """extract_audio_features decodes a mu-law payload (tone frequency
    recovered from the REAL decoded signal, not the zero fallback)."""
    from nlp_series_relation_extraction_spark.functions.audio import (
        encode_audio_wav,
        extract_audio_features,
    )

    n, rate, freq = 4096, 16_000, 1250
    pcm = (
        0.5 * np.sin(2 * np.pi * freq * np.arange(n) / rate) * 32767
    ).astype(np.int16)
    wav = encode_audio_wav(pcm, rate, codec="ulaw")
    df = spark.createDataFrame(
        [(1, bytearray(wav), ("audio/wav-ulaw", rate, n, 1))],
        "media_id long, content binary, meta struct<format:string,"
        "sample_rate:int, n_samples:int, n_channels:int>",
    )
    row = extract_audio_features(df).collect()[0]
    dom_hz = row.features[3]
    assert abs(dom_hz - freq) < rate / n + 1  # FFT-bin accuracy


def test_g711_matches_stdlib_audioop_bit_for_bit():
    """Cross-check against CPython's audioop (the canonical Sun g711.c
    port): encoder codewords and decoder expansions match bit-for-bit.
    Skipped where audioop is absent (removed in 3.13) — the involution
    test above still pins self-consistency there."""
    audioop = pytest.importorskip("audioop")

    from nlp_series_relation_extraction_spark.functions.audio import (
        alaw_decode,
        alaw_encode,
        ulaw_decode,
        ulaw_encode,
    )

    x = np.arange(-32768, 32768, 7, dtype=np.int16)
    assert (
        alaw_encode(x)
        == np.frombuffer(audioop.lin2alaw(x.tobytes(), 2), np.uint8)
    ).all()
    assert (
        ulaw_encode(x)
        == np.frombuffer(audioop.lin2ulaw(x.tobytes(), 2), np.uint8)
    ).all()
    b = np.arange(256, dtype=np.uint8).tobytes()
    assert (
        alaw_decode(np.frombuffer(b, np.uint8))
        == np.frombuffer(audioop.alaw2lin(b, 2), "<i2")
    ).all()
    assert (
        ulaw_decode(np.frombuffer(b, np.uint8))
        == np.frombuffer(audioop.ulaw2lin(b, 2), "<i2")
    ).all()


def test_g711_mislabeled_bits_raise():
    """A G.711 fmt tag with 16-bit samples is a spec violation that would
    decode plausible garbage — must raise (ValueError: caught by the
    feature-extraction fallback)."""
    import struct as _struct

    from nlp_series_relation_extraction_spark.functions.audio import (
        decode_audio_wav,
        encode_audio_wav,
    )

    wav = bytearray(encode_audio_wav(np.zeros(64, np.int16), codec="ulaw"))
    # bits-per-sample field: last H of the fmt payload at offset 20+14
    assert _struct.unpack("<H", wav[34:36])[0] == 8
    wav[34:36] = _struct.pack("<H", 16)
    with pytest.raises(ValueError, match="G.711"):
        decode_audio_wav(bytes(wav))


def test_ima_data_chunk_is_block_aligned():
    """ADVICE fix: the IMA writer pads the final short block to
    nBlockAlign, so the data chunk size divides evenly (strict decoders
    iterate by block and validate divisibility); the fact chunk still
    trims decode to the true sample count."""
    import struct

    import numpy as np

    from nlp_series_relation_extraction_spark.functions.audio import (
        decode_audio_wav,
        encode_audio_wav,
    )

    n = 700  # 505 samples/block -> second block is short pre-padding
    t = np.arange(n, dtype=np.float64)
    x = (0.4 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.float32)
    wav = encode_audio_wav(x[:, None], 8000, codec="ima")
    # walk chunks: find fmt block_align and data size
    pos, block_align, data_len = 12, None, None
    while pos + 8 <= len(wav):
        tag = wav[pos : pos + 4]
        ln = int.from_bytes(wav[pos + 4 : pos + 8], "little")
        if tag == b"fmt ":
            block_align = struct.unpack("<H", wav[pos + 20 : pos + 22])[0]
        if tag == b"data":
            data_len = ln
        pos += 8 + ln + (ln & 1)
    assert block_align == 256 and data_len is not None
    assert data_len % block_align == 0  # padded final block
    dec, rate = decode_audio_wav(wav)
    assert rate == 8000 and dec.shape[0] == n  # fact chunk trims the pad


def _tone(n=2000, freq=440, rate=16_000, seed=7, noise=0.05):
    rng = np.random.default_rng(seed)
    sig = 0.4 * np.sin(2 * np.pi * freq * np.arange(n) / rate)
    sig = sig + noise * rng.standard_normal(n)
    return np.clip(sig * 32767, -32768, 32767).astype(np.int16)


def _snr_db(ref_i16, out_f32):
    ref = ref_i16.astype(np.float64) / 32768.0
    err = ref - out_f32[: len(ref)].reshape(ref.shape)
    return 10 * np.log10(np.mean(ref**2) / max(np.mean(err**2), 1e-300))


def test_pcm_width_roundtrips_exact_24_32_lossy_8():
    """24/32-bit integer PCM round-trip the int16 payload exactly (it
    rides the high bits); 8-bit is lossy by construction (high byte,
    unsigned-midpoint 128) with error bounded by one low byte."""
    pcm = _tone()
    stereo = np.stack([pcm, np.roll(pcm, 3)], axis=1)
    for codec in ("pcm24", "pcm32"):
        for src in (pcm, stereo):
            out, rate = decode_audio_wav(encode_audio_wav(src, codec=codec))
            ref = (src.astype(np.float64) / 32768.0).reshape(out.shape)
            assert rate == 16_000 and np.array_equal(out, ref.astype(np.float32)), codec
    out, _ = decode_audio_wav(encode_audio_wav(pcm, codec="pcm8"))
    assert np.abs(out[:, 0] * 32768.0 - pcm).max() <= 256


def test_float_pcm_roundtrip_within_half_lsb():
    """IEEE float WAV (tag 3, 32- and 64-bit): decode re-quantizes to the
    int16 grid, so error is at most half an LSB."""
    import struct as _struct

    pcm = _tone()
    for codec, bits in (("float32", 32), ("float64", 64)):
        wav = encode_audio_wav(pcm, codec=codec)
        assert _struct.unpack("<H", wav[20:22])[0] == 3
        assert _struct.unpack("<H", wav[34:36])[0] == bits
        out, _ = decode_audio_wav(wav)
        assert np.abs(out[:, 0] * 32768.0 - pcm).max() <= 0.5 + 1e-6


def test_extensible_container_resolves_and_validates_guid():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE): decodes identically to the plain
    tag; a corrupted SubFormat GUID raises rather than guessing."""
    import struct as _struct

    pcm = _tone()
    stereo = np.stack([pcm, -pcm], axis=1)
    plain, _ = decode_audio_wav(encode_audio_wav(stereo, codec="pcm"))
    wav = encode_audio_wav(stereo, codec="pcm", extensible=True)
    assert _struct.unpack("<H", wav[20:22])[0] == 0xFFFE
    ext, _ = decode_audio_wav(wav)
    assert np.array_equal(plain, ext)
    # float through the container too
    f, _ = decode_audio_wav(
        encode_audio_wav(pcm, codec="float32", extensible=True)
    )
    assert np.abs(f[:, 0] * 32768.0 - pcm).max() <= 0.5 + 1e-6
    # fmt payload starts at 20; GUID = extra[6:22] = bytes 44..59, with
    # the real tag in 44-45 and the fixed media-type tail in 46..59
    bad = bytearray(wav)
    bad[50] ^= 0xFF  # inside the GUID tail
    with pytest.raises(ValueError, match="EXTENSIBLE"):
        decode_audio_wav(bytes(bad))


def test_msadpcm_container_roundtrip_mono_and_stereo():
    """MS ADPCM (tag 2): ~4:1 compression, fact-trimmed length, SNR
    floor, and a data chunk that divides evenly by nBlockAlign."""
    import struct as _struct

    pcm = _tone(n=3000)
    stereo = np.stack([pcm, np.roll(pcm, 5)], axis=1)
    for src in (pcm, stereo):
        wav = encode_audio_wav(src, codec="msadpcm")
        assert _struct.unpack("<H", wav[20:22])[0] == 2
        assert len(wav) < len(encode_audio_wav(src, codec="pcm")) * 0.35
        # walk chunks for block alignment of the data payload
        pos, block_align, data_len = 12, None, None
        while pos + 8 <= len(wav):
            tag = wav[pos : pos + 4]
            ln = int.from_bytes(wav[pos + 4 : pos + 8], "little")
            if tag == b"fmt ":
                block_align = _struct.unpack(
                    "<H", wav[pos + 20 : pos + 22]
                )[0]
            if tag == b"data":
                data_len = ln
            pos += 8 + ln + (ln & 1)
        assert data_len % block_align == 0
        out, rate = decode_audio_wav(wav)
        n = src.shape[0]
        assert rate == 16_000 and out.shape[0] == n
        assert _snr_db(src, out) > 20.0


def test_msadpcm_decode_matches_independent_spec_twin():
    """The vectorized block decoder equals a from-the-spec scalar twin
    (predictor table, >>8 fixed-point prediction, signed nibbles, idelta
    adaption floor 16) on real encoder output, mono and stereo."""
    from nlp_series_relation_extraction_spark.functions.audio import (
        _MS_ADAPT,
        _MS_COEFS,
        msadpcm_decode_block,
        msadpcm_encode_block,
    )
    import struct as _struct

    def twin(block, ch):
        preds = list(block[:ch])
        off = ch
        idelta = list(_struct.unpack_from(f"<{ch}h", block, off)); off += 2 * ch
        s1 = list(_struct.unpack_from(f"<{ch}h", block, off)); off += 2 * ch
        s2 = list(_struct.unpack_from(f"<{ch}h", block, off)); off += 2 * ch
        hist = [[s2[c], s1[c]] for c in range(ch)]
        k = 0
        for byte in block[off:]:
            for nib in (byte >> 4, byte & 0x0F):
                c = k % ch
                sn = nib - 16 if nib >= 8 else nib
                pred = (
                    hist[c][-1] * _MS_COEFS[preds[c]][0]
                    + hist[c][-2] * _MS_COEFS[preds[c]][1]
                ) >> 8
                s = max(-32768, min(32767, pred + sn * idelta[c]))
                hist[c].append(s)
                idelta[c] = max(16, (_MS_ADAPT[nib] * idelta[c]) >> 8)
                k += 1
        n = min(len(h) for h in hist)
        return np.stack(
            [np.asarray(h[:n], dtype=np.int16) for h in hist], axis=1
        )

    pcm = _tone(n=509, seed=11)
    block = msadpcm_encode_block(pcm, 256)
    assert np.array_equal(msadpcm_decode_block(block, 1), twin(block, 1))
    stereo = np.stack([pcm, np.roll(pcm, 2)], axis=1)
    block2 = msadpcm_encode_block(stereo, 512)
    assert np.array_equal(msadpcm_decode_block(block2, 2), twin(block2, 2))


def test_ima_stereo_block_is_word_interleaved_mono_pair():
    """The stereo IMA block is exactly two mono nibble streams interleaved
    as alternating 4-byte words after per-channel headers: de-interleaving
    by hand and decoding each stream as a mono block reproduces the
    stereo decode channel-for-channel."""
    from nlp_series_relation_extraction_spark.functions.audio import (
        ima_adpcm_decode_block,
        ima_adpcm_decode_block_stereo,
        ima_adpcm_encode_block_stereo,
    )

    pcm = _tone(n=505, seed=3)
    stereo = np.stack([pcm, np.roll(pcm, 9)], axis=1)
    block, _ = ima_adpcm_encode_block_stereo(stereo)
    both = ima_adpcm_decode_block_stereo(block)
    body = block[8:]
    for c in (0, 1):
        words = [body[i + 4 * c : i + 4 * c + 4] for i in range(0, len(body), 8)]
        mono_block = block[4 * c : 4 * c + 4] + b"".join(words)
        mono = ima_adpcm_decode_block(mono_block)
        assert np.array_equal(mono[: both.shape[0]], both[:, c])


def test_ima_stereo_container_roundtrip():
    pcm = _tone(n=1700, seed=19)
    stereo = np.stack([pcm, np.roll(pcm, 11)], axis=1)
    wav = encode_audio_wav(stereo, codec="ima")
    out, rate = decode_audio_wav(wav)
    assert rate == 16_000 and out.shape == (1700, 2)
    assert _snr_db(stereo, out) > 20.0
    assert len(wav) < len(encode_audio_wav(stereo, codec="pcm")) * 0.35


def test_new_codecs_through_spark_feature_extraction(spark):
    """extract_audio_features recovers the planted tone through every new
    container variant (MS ADPCM, 24-bit PCM, float32, EXTENSIBLE) — the
    decode really runs inside the Arrow batch, not the zero fallback."""
    from nlp_series_relation_extraction_spark.functions.audio import (
        extract_audio_features,
    )

    n, rate, freq = 4096, 16_000, 1250
    pcm = (
        0.5 * np.sin(2 * np.pi * freq * np.arange(n) / rate) * 32767
    ).astype(np.int16)
    payloads = [
        encode_audio_wav(pcm, rate, codec="msadpcm"),
        encode_audio_wav(pcm, rate, codec="pcm24"),
        encode_audio_wav(pcm, rate, codec="float32"),
        encode_audio_wav(pcm, rate, codec="pcm", extensible=True),
    ]
    df = spark.createDataFrame(
        [
            (i, bytearray(p), ("audio/wav", rate, n, 1))
            for i, p in enumerate(payloads)
        ],
        "media_id long, content binary, meta struct<format:string,"
        "sample_rate:int, n_samples:int, n_channels:int>",
    )
    rows = extract_audio_features(df).collect()
    assert len(rows) == 4
    for row in rows:
        assert abs(row.features[3] - freq) < rate / n + 1


def test_decoder_fails_closed_on_arbitrary_bytes():
    """Fuzz the RIFF walker + every codec branch: arbitrary byte strings
    (including truncated real WAVs and bit-flipped headers) either decode
    or raise ValueError/NotImplementedError — never IndexError/
    struct.error/ZeroDivisionError, which would crash the Arrow batch
    instead of hitting extract_audio_features' documented fallback."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    real = encode_audio_wav(_tone(n=300), codec="msadpcm")

    @settings(max_examples=200, deadline=None)
    @given(st.binary(max_size=200))
    def fuzz_raw(payload):
        try:
            decode_audio_wav(payload)
        except (ValueError, NotImplementedError):
            pass

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(0, len(real) - 1),
        st.integers(0, 255),
        st.integers(8, len(real)),
    )
    def fuzz_mutated(pos, byte, cut):
        mutated = bytearray(real[:cut])
        if pos < len(mutated):
            mutated[pos] = byte
        try:
            decode_audio_wav(bytes(mutated))
        except (ValueError, NotImplementedError):
            pass

    fuzz_raw()
    fuzz_mutated()
