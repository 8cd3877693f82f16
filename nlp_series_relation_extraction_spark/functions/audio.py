"""Audio columns: WAV (RIFF PCM) codec + deterministic signal features.

Completes the multimodal triple (image / video / AUDIO) with the same
design as functions/multimodal.py: payloads are opaque ``binary`` columns
with typed metadata, decode and feature extraction are pure numpy inside
Arrow-batched ``mapInPandas``, and the synthetic source derives everything
deterministically from text so the SQL-expressible metadata slice
(sample rate, n_samples, byte size) carries a DuckDB oracle while the
signal-dependent features are pinned by Spark==local-decode tests.

Scope: WAV in the formats telephony/interchange pipelines actually
move — integer PCM (tag 1) at 8/16/24/32 bits mono/stereo, IEEE float
PCM (tag 3, 32/64-bit), G.711 mu-law (tag 7) and A-law (tag 6)
companding, IMA ADPCM (tag 0x11, block-based 4-bit) mono AND stereo,
MS ADPCM (tag 2, predictor-table 4-bit) mono/stereo, and the
WAVE_FORMAT_EXTENSIBLE (0xFFFE) container resolving any of the above
through its SubFormat GUID. Perceptual-codec formats (mp3/ogg) are the
documented integration point, exactly like exotic image formats
(lossless compression is covered by functions/flac.py).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
from pyspark.sql import DataFrame, functions as F

AUDIO_SCHEMA = (
    "media_id bigint, content binary, "
    "meta struct<format:string, sample_rate:int, n_samples:int, n_channels:int>"
)

AUDIO_FEATURE_DIM = 12


# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail (KSDATAFORMAT_SUBTYPE_*):
# the first two bytes of the GUID carry the classic format tag, the
# remaining 14 are this fixed media-type base (public ksmedia.h value).
_EXT_GUID_TAIL = b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def encode_audio_wav(
    samples: np.ndarray,
    sample_rate: int = 16_000,
    codec: str = "pcm",
    extensible: bool = False,
) -> bytes:
    """Encode int16 samples ([n] mono or [n, ch]) as a WAV payload.

    ``codec``: 'pcm' (tag 1, 16-bit), 'pcm8'/'pcm24'/'pcm32' (tag 1 at
    other widths; the int16 input is placed in the high bits), 'float32'
    / 'float64' (tag 3 IEEE float), 'ulaw' (tag 7) / 'alaw' (tag 6)
    G.711 companding, 'ima' (tag 0x11, IMA ADPCM, mono or stereo, 256-
    byte blocks with a fact chunk), or 'msadpcm' (tag 2, MS ADPCM with
    the standard 7-entry predictor table, mono or stereo).
    ``extensible=True`` wraps the PCM/float fmt in a WAVE_FORMAT_EXTENSIBLE
    (0xFFFE) header with the real tag in the SubFormat GUID."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape

    def riff(fmt_payload: bytes, chunks: bytes) -> bytes:
        body = b"fmt " + len(fmt_payload).to_bytes(4, "little") + fmt_payload
        body += chunks
        return b"RIFF" + (4 + len(body)).to_bytes(4, "little") + b"WAVE" + body

    def data_chunk(data: bytes) -> bytes:
        return (
            b"data"
            + len(data).to_bytes(4, "little")
            + data
            + (b"\x00" if len(data) & 1 else b"")
        )

    def fmt16(tag: int, bits: int) -> bytes:
        bps = ch * (bits // 8)
        base = struct.pack(
            "<HHIIHH", tag, ch, sample_rate, sample_rate * bps, bps, bits
        )
        if not extensible:
            return base
        # 0xFFFE container: same 16-byte core (tag swapped), cbSize=22,
        # validBits, channelMask (0 = unspecified), SubFormat GUID
        core = struct.pack(
            "<HHIIHH", 0xFFFE, ch, sample_rate, sample_rate * bps, bps, bits
        )
        return core + struct.pack("<HHI", 22, bits, 0) + struct.pack(
            "<H", tag
        ) + _EXT_GUID_TAIL

    if codec == "pcm":
        return riff(fmt16(1, 16), data_chunk(a.reshape(-1).tobytes()))
    if codec == "pcm8":
        data = ((a.reshape(-1).astype(np.int32) >> 8) + 128).astype(
            np.uint8
        ).tobytes()
        return riff(fmt16(1, 8), data_chunk(data))
    if codec == "pcm24":
        # int16 into the top 16 of a 24-bit little-endian triple
        x = (a.reshape(-1).astype(np.int32) << 8).astype("<i4")
        data = x.view(np.uint8).reshape(-1, 4)[:, :3].tobytes()
        return riff(fmt16(1, 24), data_chunk(data))
    if codec == "pcm32":
        data = (a.reshape(-1).astype(np.int64) << 16).astype("<i4").tobytes()
        return riff(fmt16(1, 32), data_chunk(data))
    if codec in ("float32", "float64"):
        dt = "<f4" if codec == "float32" else "<f8"
        data = (a.reshape(-1).astype(np.float64) / 32768.0).astype(dt).tobytes()
        return riff(
            fmt16(3, 32 if codec == "float32" else 64), data_chunk(data)
        )
    if codec == "msadpcm":
        return _encode_msadpcm(a, sample_rate, riff, data_chunk)
    if codec in ("ulaw", "alaw"):
        enc = ulaw_encode if codec == "ulaw" else alaw_encode
        data = enc(a.reshape(-1)).tobytes()
        tag = 7 if codec == "ulaw" else 6
        fmt = struct.pack(
            "<HHIIHH", tag, ch, sample_rate, sample_rate * ch, ch, 8
        )
        return riff(fmt, data_chunk(data))
    if codec == "ima":
        if ch == 1:
            mono = a[:, 0]
            block_align = 256  # 4-byte header + 252 nibble bytes
            spb = 1 + (block_align - 4) * 2  # 505 samples per block
            blocks = []
            # seed the quantizer from the signal's typical slope instead of
            # index 0 (step 7): from silence the index needs ~40 samples to
            # adapt up to a loud tone — a slope-overload transient real
            # encoders avoid exactly this way (the index is per-block header
            # state, so any seed is decodable)
            idx = _ima_seed_index(mono[:spb])
            for i in range(0, len(mono), spb):
                block, idx = ima_adpcm_encode_block(
                    mono[i : i + spb], index=idx
                )
                blocks.append(block)
        elif ch == 2:
            block_align = 512  # 2×4-byte headers + 63 4-byte words/channel
            spb = 1 + (block_align - 4 * ch) * 2 // ch  # 505 per channel
            blocks = []
            idx = [_ima_seed_index(a[:spb, c]) for c in range(ch)]
            for i in range(0, n, spb):
                block, idx = ima_adpcm_encode_block_stereo(
                    a[i : i + spb], indices=idx
                )
                blocks.append(block)
        else:
            raise ValueError("IMA ADPCM encoder supports 1 or 2 channels")
        # pad the final short block to nBlockAlign: strict decoders iterate
        # by block_align and check chunk-size divisibility; the fact chunk
        # already trims the zero-nibble tail samples on decode
        if blocks and len(blocks[-1]) < block_align:
            blocks[-1] += b"\x00" * (block_align - len(blocks[-1]))
        data = b"".join(blocks)
        fmt = struct.pack(
            "<HHIIHHHH", 0x11, ch, sample_rate,
            (sample_rate * ch * block_align) // (spb * ch), block_align,
            4, 2, spb,
        )
        fact = b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
        return riff(fmt, fact + data_chunk(data))
    raise ValueError(f"unknown WAV codec {codec!r}")


def _ima_seed_index(seg: np.ndarray) -> int:
    """Step-index seed from a segment's typical slope (see the encoder
    comment above — avoids the slope-overload transient of index 0)."""
    if len(seg) <= 1:
        return 0
    typical = int(np.mean(np.abs(np.diff(np.asarray(seg, dtype=np.int64)))))
    return int(np.clip(np.searchsorted(_IMA_STEPS, max(typical, 7)), 0, 88))


def _encode_msadpcm(a: np.ndarray, sample_rate: int, riff, data_chunk) -> bytes:
    """MS ADPCM (tag 2) encode: standard 7-coefficient table, per-block
    per-channel predictor chosen by trial encode (least squared error),
    256-byte-aligned blocks, fact chunk with the true sample count."""
    n, ch = a.shape
    block_align = 256 * ch
    spb = (block_align - 7 * ch) * 2 // ch + 2
    blocks = [
        msadpcm_encode_block(a[i : i + spb], block_align)
        for i in range(0, n, spb)
    ]
    # pad the final short block to nBlockAlign (same strict-decoder
    # contract as the IMA branch; fact trims the tail on decode)
    if blocks and len(blocks[-1]) < block_align:
        blocks[-1] += b"\x00" * (block_align - len(blocks[-1]))
    data = b"".join(blocks)
    extra = struct.pack("<HH", spb, 7) + b"".join(
        struct.pack("<hh", c1, c2) for c1, c2 in _MS_COEFS
    )
    fmt = struct.pack(
        "<HHIIHHH", 2, ch, sample_rate,
        (sample_rate * block_align) // spb, block_align, 4, len(extra),
    ) + extra
    fact = b"fact" + (4).to_bytes(4, "little") + n.to_bytes(4, "little")
    return riff(fmt, fact + data_chunk(data))


def decode_audio_wav(content: bytes) -> tuple[np.ndarray, int]:
    """WAV -> (float32 samples in [-1, 1] shaped [n, ch], sample_rate).

    Walks RIFF chunks (extra chunks like LIST are skipped). Formats:
    integer PCM at 8/16/24/32 bits (tag 1), IEEE float 32/64 (tag 3),
    G.711 mu-law (7) / A-law (6), IMA ADPCM (0x11) mono/stereo,
    MS ADPCM (2) mono/stereo, and WAVE_FORMAT_EXTENSIBLE (0xFFFE)
    resolving to any of these via the SubFormat GUID. Block codecs trim
    to the fact-chunk sample count. Perceptual codecs raise
    NotImplementedError pointedly."""
    data = bytes(content)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    extra = b""
    pcm = None
    fact_n = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            if len(payload) < 16:  # truncated header: fail closed
                raise ValueError("invalid WAV: truncated fmt chunk")
            audio_fmt, ch, rate, _br, block_align, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            extra = payload[18:] if len(payload) > 18 else b""
            if audio_fmt == 0xFFFE:
                # EXTENSIBLE: real tag is the GUID's first two bytes;
                # anything else in the remaining 14 is not WAVE-mapped
                # extra = validBits(2) + channelMask(4) + SubFormat GUID(16)
                if len(extra) < 22 or extra[8:22] != _EXT_GUID_TAIL:
                    raise ValueError("invalid WAVE_FORMAT_EXTENSIBLE GUID")
                audio_fmt = int.from_bytes(extra[6:8], "little")
                extra = b""
            if audio_fmt not in (1, 2, 3, 6, 7, 0x11):
                raise NotImplementedError(
                    f"WAV audio format {audio_fmt} — PCM/float/G.711/"
                    "IMA-ADPCM/MS-ADPCM decode natively; plug "
                    "soundfile/ffmpeg here for perceptual codecs"
                )
            if audio_fmt == 1 and bits not in (8, 16, 24, 32):
                raise NotImplementedError(f"{bits}-bit integer PCM WAV")
            if audio_fmt == 3 and bits not in (32, 64):
                raise ValueError(f"invalid WAV: {bits}-bit IEEE float")
            if audio_fmt in (6, 7) and bits != 8:
                # a mislabeled payload would byte-decode 16-bit samples as
                # G.711 codewords into plausible garbage — raise instead
                raise ValueError(
                    f"invalid WAV: G.711 format {audio_fmt} with "
                    f"{bits}-bit samples (must be 8)"
                )
            fmt = (audio_fmt, ch, rate, block_align, bits)
        elif tag == b"data":
            pcm = payload
        elif tag == b"fact":
            fact_n = int.from_bytes(payload[:4], "little")
    if fmt is None or pcm is None:
        raise ValueError("invalid WAV: missing fmt/data chunk")
    audio_fmt, ch, rate, block_align, bits = fmt
    if audio_fmt == 1:
        if bits == 16:
            samples = np.frombuffer(pcm, dtype="<i2")
        elif bits == 8:  # 8-bit PCM is unsigned, midpoint 128
            samples = (
                np.frombuffer(pcm, dtype=np.uint8).astype(np.int32) - 128
            ) << 8
        elif bits == 24:
            b3 = np.frombuffer(
                pcm[: len(pcm) - len(pcm) % 3], dtype=np.uint8
            ).reshape(-1, 3)
            x = (
                b3[:, 0].astype(np.int32)
                | (b3[:, 1].astype(np.int32) << 8)
                | (b3[:, 2].astype(np.int32) << 16)
            )
            samples = (np.where(x >= 1 << 23, x - (1 << 24), x)) >> 8
        else:  # 32-bit
            samples = np.frombuffer(pcm, dtype="<i4") >> 16
    elif audio_fmt == 3:
        f = np.frombuffer(pcm, dtype="<f4" if bits == 32 else "<f8")
        samples = np.clip(
            np.rint(f.astype(np.float64) * 32768.0), -32768, 32767
        ).astype(np.int64)
    elif audio_fmt in (6, 7):
        dec = ulaw_decode if audio_fmt == 7 else alaw_decode
        samples = dec(np.frombuffer(pcm, dtype=np.uint8))
    elif audio_fmt == 2:  # MS ADPCM, interleaved blocks
        if block_align < 7 * ch + 1 or ch not in (1, 2):
            raise ValueError("invalid WAV: bad MS ADPCM block align")
        parts = [
            msadpcm_decode_block(pcm[i : i + block_align], ch)
            for i in range(0, len(pcm), block_align)
            if len(pcm[i : i + block_align]) >= 7 * ch
        ]
        samples = (
            np.concatenate(parts).reshape(-1)
            if parts
            else np.zeros(0, dtype=np.int16)
        )
        if fact_n is not None:
            samples = samples[: fact_n * ch]
    else:  # IMA ADPCM blocks
        if ch not in (1, 2):
            raise NotImplementedError(f"{ch}-channel IMA ADPCM")
        if block_align < 4 * ch + 1:
            raise ValueError("invalid WAV: bad IMA block align")
        dec = (
            ima_adpcm_decode_block
            if ch == 1
            else lambda blk: ima_adpcm_decode_block_stereo(blk).reshape(-1)
        )
        parts = [
            dec(pcm[i : i + block_align])
            for i in range(0, len(pcm), block_align)
            if len(pcm[i : i + block_align]) >= 4 * ch
        ]
        samples = (
            np.concatenate(parts) if parts else np.zeros(0, dtype=np.int16)
        )
        if fact_n is not None:
            samples = samples[: fact_n * ch]
    n = len(samples) // ch
    return (
        np.asarray(samples[: n * ch], dtype=np.float64)
        .reshape(n, ch)
        .astype(np.float32)
        / 32768.0,
        rate,
    )


def audio_features(
    samples: np.ndarray, sample_rate: int, dim: int = AUDIO_FEATURE_DIM
) -> np.ndarray:
    """Deterministic REAL signal features from decoded samples (mono mix):
    RMS, peak, zero-crossing rate, dominant-frequency bin (Hz), and an
    8-band log-spaced spectral energy profile = 12 dims."""
    mono = np.asarray(samples, dtype=np.float64)
    if mono.ndim == 2:
        mono = mono.mean(axis=1)
    n = max(len(mono), 1)
    rms = float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0
    peak = float(np.max(np.abs(mono))) if len(mono) else 0.0
    zcr = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
        if len(mono) > 1
        else 0.0
    )
    spec = np.abs(np.fft.rfft(mono)) if len(mono) else np.zeros(1)
    dom_bin = int(np.argmax(spec[1:]) + 1) if len(spec) > 1 else 0
    dom_hz = dom_bin * sample_rate / n
    edges = np.unique(
        np.geomspace(1, max(len(spec) - 1, 1), 9).astype(np.int64)
    )
    bands = np.zeros(8, dtype=np.float64)
    for i in range(min(8, len(edges) - 1)):
        seg = spec[edges[i] : edges[i + 1] + 1]
        if len(seg):
            bands[i] = np.log1p(float(np.sum(seg**2)))
    out = np.asarray([rms, peak, zcr, dom_hz, *bands], dtype=np.float32)
    assert out.shape[0] == dim
    return out


def synthesize_audio(
    df: DataFrame, id_col: str, text_col: str, sample_rate: int = 16_000
) -> DataFrame:
    """Deterministic audio table from a text table: payloads are REAL PCM
    WAV clips (md5-seeded tone + noise; clip length derived from the utf-8
    byte length, n_samples = strlen*32 + 256 — SQL-derivable for the
    audio_meta oracle)."""
    import pandas as pd

    def gen(batches):
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "content": [],
                "format": [],
                "sample_rate": [],
                "n_samples": [],
                "n_channels": [],
            }
            for text in pdf["text"]:
                t = (text or "").encode("utf-8")
                n = len(t) * 32 + 256
                seed = int.from_bytes(hashlib.md5(t).digest()[:8], "little")
                rng = np.random.default_rng(seed)
                freq = 100.0 + (seed % 4000)
                k = np.arange(n, dtype=np.float64)
                tone = 0.5 * np.sin(2 * np.pi * freq * k / sample_rate)
                noise = 0.05 * rng.standard_normal(n)
                pcm = np.clip((tone + noise) * 32767, -32768, 32767).astype(
                    np.int16
                )
                out["content"].append(encode_audio_wav(pcm, sample_rate))
                out["format"].append("audio/wav")
                out["sample_rate"].append(sample_rate)
                out["n_samples"].append(n)
                out["n_channels"].append(1)
            yield pd.DataFrame(out)

    flat = _spread(
        df.select(
            F.col(id_col).alias("media_id"), F.col(text_col).alias("text")
        )
    ).mapInPandas(
        gen,
        schema="media_id bigint, content binary, format string, "
        "sample_rate int, n_samples int, n_channels int",
    )
    return flat.select(
        "media_id",
        "content",
        F.struct("format", "sample_rate", "n_samples", "n_channels").alias(
            "meta"
        ),
    )


def extract_audio_features(audio: DataFrame) -> DataFrame:
    """audio -> (media_id, sample_rate, n_samples, n_bytes, features).
    Arrow-batched; undecodable/null payloads fall back to zeros so the
    pipeline stays total (mirroring multimodal.extract_features)."""
    import pandas as pd

    schema = (
        "media_id bigint, sample_rate int, n_samples int, n_bytes long, "
        "features array<float>"
    )

    def run(batches):
        for pdf in batches:
            feats = []
            for c, rate in zip(pdf["content"], pdf["sample_rate"]):
                if c is None:
                    feats.append([0.0] * AUDIO_FEATURE_DIM)
                    continue
                try:
                    samples, r = decode_audio(c)
                    feats.append(audio_features(samples, r).tolist())
                except (NotImplementedError, ValueError):
                    feats.append([0.0] * AUDIO_FEATURE_DIM)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": pdf["sample_rate"],
                    "n_samples": pdf["n_samples"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    flat = audio.select(
        "media_id",
        "content",
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.n_samples").alias("n_samples"),
    )
    return flat.mapInPandas(run, schema=schema)


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Container-sniffing decode: RIFF/WAVE -> decode_audio_wav, fLaC ->
    functions/flac.py (lossless, int samples scaled to the same float32
    [-1, 1] convention). The one audio entry point pipeline stages need.

    Same boundary contract as multimodal.decode_image: decode or raise
    ValueError/NotImplementedError, never a decoder-internal exception —
    extract_audio_features' fallback catches exactly those two (pinned
    by tests/test_codec_fuzz.py)."""
    data = bytes(content)
    try:
        if data[:4] == b"fLaC":
            from .flac import decode_audio_flac

            samples, rate = decode_audio_flac(data)
            return (samples.astype(np.float32) / 32768.0), rate
        return decode_audio_wav(data)
    except (ValueError, NotImplementedError):
        raise
    except Exception as e:
        raise ValueError(
            f"malformed audio payload: {type(e).__name__}: {e}"
        ) from e


def synthesize_audio_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sample_rate: int = 16_000,
    transport: str = "wav",
) -> DataFrame:
    """Fused synth -> decode -> features in ONE Arrow pass.

    The staged path (synthesize_audio |> extract_audio_features) ships the
    ~20KB-per-row WAV payload JVM->Python->JVM->Python: two adjacent
    mapInPandas stages cannot be fused by Catalyst, so the binary column
    crosses the Arrow boundary three times. When stages are adjacent and
    the intermediate is only consumed by the next stage, compose the pure
    per-row functions inside one UDF instead — the payload never leaves
    the Python worker. Output is pinned byte-identical to the staged path
    (tests/test_audio.py); a pipeline that needs the WAV column
    materialized still uses the staged operators.

    ``transport='flac'`` carries the same clips FLAC-compressed
    (functions/flac.py) — the features are IDENTICAL to the WAV path
    because FLAC is lossless (pinned in tests/test_flac.py); only
    n_bytes changes (the compressed payload size)."""
    import pandas as pd

    if transport not in ("wav", "flac"):
        raise ValueError(f"unknown audio transport {transport!r}")

    def run(batches):
        for pdf in batches:
            rows = {
                "media_id": pdf["media_id"],
                "sample_rate": [],
                "n_samples": [],
                "n_bytes": [],
                "features": [],
            }
            for text in pdf["text"]:
                t = (text or "").encode("utf-8")
                n = len(t) * 32 + 256
                seed = int.from_bytes(hashlib.md5(t).digest()[:8], "little")
                rng = np.random.default_rng(seed)
                freq = 100.0 + (seed % 4000)
                k = np.arange(n, dtype=np.float64)
                tone = 0.5 * np.sin(2 * np.pi * freq * k / sample_rate)
                noise = 0.05 * rng.standard_normal(n)
                pcm = np.clip((tone + noise) * 32767, -32768, 32767).astype(
                    np.int16
                )
                if transport == "flac":
                    from .flac import encode_audio_flac

                    payload = encode_audio_flac(pcm, sample_rate)
                else:
                    payload = encode_audio_wav(pcm, sample_rate)
                samples, r = decode_audio(payload)
                rows["sample_rate"].append(sample_rate)
                rows["n_samples"].append(n)
                rows["n_bytes"].append(len(payload))
                rows["features"].append(audio_features(samples, r).tolist())
            yield pd.DataFrame(rows)

    return _spread(
        df.select(
            F.col(id_col).alias("media_id"), F.col(text_col).alias("text")
        )
    ).mapInPandas(
        run,
        schema="media_id bigint, sample_rate int, n_samples int,"
        " n_bytes long, features array<float>",
    )


from .partitioning import ensure_parallelism as _spread  # noqa: E402


# --- G.711 companding (mu-law tag 7 / A-law tag 6) ---------------------------


def ulaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> mu-law bytes, vectorized — the canonical Sun g711.c
    linear2ulaw in its exact 14-bit domain (arithmetic >>2 BEFORE
    negation, clip 8159, bias 33), so codewords match reference encoders
    bit-for-bit including the negative segment boundaries."""
    x14 = np.asarray(x, dtype=np.int32) >> 2  # arithmetic shift
    neg = x14 < 0
    mag = np.minimum(np.where(neg, -x14, x14), 8159) + 33
    seg = np.maximum(
        np.floor(np.log2(mag)).astype(np.int32) - 5, 0
    )  # bit_length - 6, mag >= 33
    mant = (mag >> (seg + 1)) & 0x0F
    uval = np.where(seg >= 8, 0x7F, (seg << 4) | mant)
    mask = np.where(neg, 0x7F, 0xFF)
    return ((uval ^ mask) & 0xFF).astype(np.uint8)


def ulaw_decode(b: np.ndarray) -> np.ndarray:
    """mu-law bytes -> int16, vectorized (exact G.711 expansion)."""
    u = ~np.asarray(b, dtype=np.int64) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    v = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign != 0, -v, v).astype(np.int16)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """int16 -> A-law bytes (G.711, 0x55 toggle), vectorized. Negative
    magnitudes use the canonical one's-complement form (-x13 - 1, Sun
    g711.c linear2alaw) so codewords match reference encoders bit-for-bit
    at segment boundaries too."""
    x13 = np.asarray(x, dtype=np.int32) >> 3  # arithmetic shift, 13-bit
    sign = np.where(x13 >= 0, 0x80, 0)
    mag = np.where(x13 >= 0, x13, -x13 - 1)
    exp = np.maximum(
        (np.floor(np.log2(np.maximum(mag, 1))) - 4).astype(np.int32), 0
    )
    # exp >= 1: magnitude sits in [16 << exp, 32 << exp) so (mag >> exp)
    # is 16..31 and the low 4 bits are the mantissa; exp == 0 is linear
    mant = np.where(exp > 0, (mag >> exp) & 0x0F, (mag >> 1) & 0x0F)
    return (((sign | (exp << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """A-law bytes -> int16, vectorized (exact G.711 expansion)."""
    a = (np.asarray(b, dtype=np.int64) ^ 0x55) & 0xFF
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    v = np.where(
        exp > 0, ((mant << 4) + 0x108) << (exp - 1), (mant << 4) + 8
    )
    return np.where(sign != 0, v, -v).astype(np.int16)


# --- IMA ADPCM (tag 0x11, mono) ----------------------------------------------

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
        37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
        157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
        544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
        1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
        4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
        12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
        29794, 32767,
    ],
    dtype=np.int64,
)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_step(pred: int, index: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM decode update (shared by encode — the encoder tracks
    the decoder's state so both stay in sync)."""
    step = int(_IMA_STEPS[index])
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + int(_IMA_INDEX[nib & 7])))
    return pred, index


def ima_adpcm_encode_block(
    samples: np.ndarray, index: int = 0
) -> tuple[bytes, int]:
    """One mono IMA block: 4-byte header (predictor int16, step index,
    reserved) + packed nibbles (low nibble first). samples[0] seeds the
    predictor; samples[1:] encode as nibbles. Returns (block_bytes,
    final_step_index) — callers carry the index into the NEXT block's
    header so the quantizer stays adapted across block boundaries (the
    behavior real IMA encoders have; resetting to 0 each block costs
    ~6 dB of SNR re-adapting at every boundary)."""
    s = np.asarray(samples, dtype=np.int64)
    pred = int(s[0])
    out = bytearray(struct.pack("<hBB", pred, index, 0))
    nibs = []
    for x in s[1:]:
        step = int(_IMA_STEPS[index])
        delta = int(x) - pred
        nib = 8 if delta < 0 else 0
        delta = abs(delta)
        temp = step
        for bit in (4, 2, 1):
            if delta >= temp:
                nib |= bit
                delta -= temp
            temp >>= 1
        pred, index = _ima_step(pred, index, nib)
        nibs.append(nib)
    if len(nibs) % 2:
        nibs.append(0)
    for lo, hi in zip(nibs[0::2], nibs[1::2]):
        out.append(lo | (hi << 4))
    return bytes(out), index


def ima_adpcm_decode_block(block: bytes) -> np.ndarray:
    """One mono IMA block -> int16 samples (header sample + nibbles)."""
    pred, index, _ = struct.unpack("<hBB", block[:4])
    out = [pred]
    for byte in block[4:]:
        for nib in (byte & 0x0F, byte >> 4):
            pred, index = _ima_step(pred, index, nib)
            out.append(pred)
    return np.asarray(out, dtype=np.int16)


def ima_adpcm_encode_block_stereo(
    samples: np.ndarray, indices: list[int] | None = None
) -> tuple[bytes, list[int]]:
    """One stereo IMA block from int16 samples shaped [n, 2]: per-channel
    4-byte headers (left then right), then data as alternating 4-byte
    words — 8 left nibbles, 8 right nibbles, ... (the standard WAV
    DVI/IMA interleave). Returns (block_bytes, final_step_indices)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim != 2 or s.shape[1] != 2:
        raise ValueError("stereo IMA encoder wants [n, 2] samples")
    indices = list(indices) if indices is not None else [0, 0]
    heads = []
    chans = []
    for c in (0, 1):
        block, indices[c] = ima_adpcm_encode_block(s[:, c], index=indices[c])
        heads.append(block[:4])
        # pad the per-channel nibble payload to whole 4-byte words
        body = block[4:]
        if len(body) % 4:
            body += b"\x00" * (4 - len(body) % 4)
        chans.append(body)
    width = max(len(chans[0]), len(chans[1]))
    chans = [b.ljust(width, b"\x00") for b in chans]
    out = bytearray(heads[0] + heads[1])
    for i in range(0, width, 4):
        out += chans[0][i : i + 4] + chans[1][i : i + 4]
    return bytes(out), indices


def ima_adpcm_decode_block_stereo(block: bytes) -> np.ndarray:
    """One stereo IMA block -> int16 samples shaped [n, 2]."""
    if len(block) < 8:
        raise ValueError("stereo IMA block shorter than its headers")
    preds = [0, 0]
    idxs = [0, 0]
    outs: list[list[int]] = [[], []]
    for c in (0, 1):
        p, ix, _ = struct.unpack_from("<hBB", block, 4 * c)
        preds[c], idxs[c] = p, ix
        outs[c].append(p)
    body = block[8:]
    for w in range(0, len(body) - len(body) % 8, 8):
        for c in (0, 1):
            for byte in body[w + 4 * c : w + 4 * c + 4]:
                for nib in (byte & 0x0F, byte >> 4):
                    preds[c], idxs[c] = _ima_step(preds[c], idxs[c], nib)
                    outs[c].append(preds[c])
    n = min(len(outs[0]), len(outs[1]))
    return np.stack(
        [
            np.asarray(outs[0][:n], dtype=np.int16),
            np.asarray(outs[1][:n], dtype=np.int16),
        ],
        axis=1,
    )


# --- MS ADPCM (tag 2) ---------------------------------------------------------
# Public format: Microsoft Multimedia Standards Update / RIFF WAVE spec.
# Block = per-channel (predictor-index byte, int16 idelta, int16 sample1,
# int16 sample2) headers, then 4-bit codes, channels interleaved per
# nibble (stereo: high nibble = left). sample2 PRECEDES sample1 in time.

_MS_COEFS = [
    (256, 0),
    (512, -256),
    (0, 0),
    (192, 64),
    (240, 0),
    (460, -208),
    (392, -232),
]
_MS_ADAPT = [
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
]


def _ms_clamp16(x: int) -> int:
    return -32768 if x < -32768 else (32767 if x > 32767 else x)


def msadpcm_decode_block(block: bytes, ch: int) -> np.ndarray:
    """One MS ADPCM block -> int16 samples shaped [n, ch]."""
    if len(block) < 7 * ch:
        raise ValueError("MS ADPCM block shorter than its headers")
    preds = list(block[:ch])
    if any(p >= len(_MS_COEFS) for p in preds):
        raise ValueError("MS ADPCM predictor index out of range")
    off = ch
    idelta = list(struct.unpack_from(f"<{ch}h", block, off))
    off += 2 * ch
    s1 = list(struct.unpack_from(f"<{ch}h", block, off))
    off += 2 * ch
    s2 = list(struct.unpack_from(f"<{ch}h", block, off))
    off += 2 * ch
    c1 = [_MS_COEFS[p][0] for p in preds]
    c2 = [_MS_COEFS[p][1] for p in preds]
    outs: list[list[int]] = [[s2[c], s1[c]] for c in range(ch)]
    which = 0
    for byte in block[off:]:
        for nib in (byte >> 4, byte & 0x0F):
            c = which % ch
            signed = nib - 16 if nib >= 8 else nib
            pred = (outs[c][-1] * c1[c] + outs[c][-2] * c2[c]) >> 8
            samp = _ms_clamp16(pred + signed * idelta[c])
            outs[c].append(samp)
            idelta[c] = max(16, (_MS_ADAPT[nib] * idelta[c]) >> 8)
            which += 1
    n = min(len(o) for o in outs)
    return np.stack(
        [np.asarray(o[:n], dtype=np.int16) for o in outs], axis=1
    )


def msadpcm_encode_block(samples: np.ndarray, block_align: int) -> bytes:
    """One MS ADPCM block from int16 samples shaped [n, ch] (n may be
    short for the final block). Per channel the predictor is chosen by
    trial-encoding all 7 coefficient sets and keeping the least squared
    reconstruction error — the strategy reference encoders use."""
    a = np.asarray(samples, dtype=np.int64)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    spb = (block_align - 7 * ch) * 2 // ch + 2
    if n < 2:  # header alone carries the first two samples
        a = np.vstack([a, np.zeros((2 - n, ch), dtype=np.int64)])
        n = 2

    def trial(col: np.ndarray, pidx: int):
        co1, co2 = _MS_COEFS[pidx]
        # seed idelta from the early prediction residual (spec suggests
        # scanning the block; /4 approximates the mean |code| target)
        prev1, prev2 = int(col[1]), int(col[0])
        resid = [
            abs(int(col[i]) - ((int(col[i - 1]) * co1 + int(col[i - 2]) * co2) >> 8))
            for i in range(2, min(len(col), 18))
        ]
        delta = max(16, (sum(resid) // max(len(resid), 1)) // 4)
        nibs = []
        err = 0
        d = delta
        for i in range(2, len(col)):
            pred = (prev1 * co1 + prev2 * co2) >> 8
            diff = int(col[i]) - pred
            code = diff // d if diff >= 0 else -((-diff) // d)
            code = -8 if code < -8 else (7 if code > 7 else code)
            samp = _ms_clamp16(pred + code * d)
            # nudge the code if rounding the other way reconstructs closer
            if code < 7:
                alt = _ms_clamp16(pred + (code + 1) * d)
                if abs(alt - int(col[i])) < abs(samp - int(col[i])):
                    code += 1
                    samp = alt
            nibs.append(code & 0x0F)
            err += (samp - int(col[i])) ** 2
            prev2, prev1 = prev1, samp
            d = max(16, (_MS_ADAPT[code & 0x0F] * d) >> 8)
        return err, delta, nibs

    heads_pred = []
    heads_delta = []
    nib_streams = []
    for c in range(ch):
        best = min(
            (trial(a[:, c], p) + (p,) for p in range(len(_MS_COEFS))),
            key=lambda t: t[0],
        )
        _, delta, nibs, pidx = best
        heads_pred.append(pidx)
        heads_delta.append(delta)
        # pad the nibble stream so every channel covers spb-2 codes
        nib_streams.append(nibs + [0] * ((spb - 2) - len(nibs)))
    out = bytearray(bytes(heads_pred))
    out += struct.pack(f"<{ch}h", *heads_delta)
    out += struct.pack(f"<{ch}h", *[int(a[1, c]) for c in range(ch)])
    out += struct.pack(f"<{ch}h", *[int(a[0, c]) for c in range(ch)])
    flat = [
        nib_streams[i % ch][i // ch] for i in range((spb - 2) * ch)
    ]
    if len(flat) % 2:
        flat.append(0)
    for hi, lo in zip(flat[0::2], flat[1::2]):
        out.append((hi << 4) | lo)
    return bytes(out)
