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
    struct.pack_into("<H", bad, 20, 3)  # float format tag
    with pytest.raises(NotImplementedError, match="PCM"):
        decode_audio_wav(bytes(bad))
    bad = bytearray(enc)
    struct.pack_into("<H", bad, 34, 8)  # 8-bit depth
    with pytest.raises(NotImplementedError, match="16-bit"):
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
