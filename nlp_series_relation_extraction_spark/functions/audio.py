"""Audio columns: WAV (RIFF PCM) codec + deterministic signal features.

Completes the multimodal triple (image / video / AUDIO) with the same
design as functions/multimodal.py: payloads are opaque ``binary`` columns
with typed metadata, decode and feature extraction are pure numpy inside
Arrow-batched ``mapInPandas``, and the synthetic source derives everything
deterministically from text so the SQL-expressible metadata slice
(sample rate, n_samples, byte size) carries a DuckDB oracle while the
signal-dependent features are pinned by Spark==local-decode tests.

Scope: 16-bit PCM mono/stereo WAV (the interchange format raw audio
pipelines actually move); compressed codecs (mp3/ogg/flac) are the
documented integration point, exactly like exotic image formats.
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


def encode_audio_wav(
    samples: np.ndarray, sample_rate: int = 16_000
) -> bytes:
    """Encode int16 samples ([n] mono or [n, ch]) as a PCM WAV payload."""
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    data = a.reshape(-1).tobytes()  # interleaved frames
    byte_rate = sample_rate * ch * 2
    hdr = (
        b"RIFF"
        + (36 + len(data)).to_bytes(4, "little")
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
        + b"data"
        + len(data).to_bytes(4, "little")
    )
    return hdr + data


def decode_audio_wav(content: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> (float32 samples in [-1, 1] shaped [n, ch], sample_rate).
    Walks RIFF chunks (extra chunks like LIST are skipped); 16-bit PCM
    only — compressed codecs raise NotImplementedError pointedly."""
    data = bytes(content)
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        ln = int.from_bytes(data[pos + 4 : pos + 8], "little")
        payload = data[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt != 1:
                raise NotImplementedError(
                    f"WAV audio format {audio_fmt} (compressed) — only PCM "
                    "decodes natively; plug soundfile/ffmpeg here"
                )
            if bits != 16:
                raise NotImplementedError(f"{bits}-bit WAV (16-bit PCM only)")
            fmt = (ch, rate)
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("invalid WAV: missing fmt/data chunk")
    ch, rate = fmt
    samples = np.frombuffer(pcm, dtype="<i2")
    n = len(samples) // ch
    return (
        samples[: n * ch].reshape(n, ch).astype(np.float32) / 32768.0,
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
                    samples, r = decode_audio_wav(c)
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


def synthesize_audio_features(
    df: DataFrame, id_col: str, text_col: str, sample_rate: int = 16_000
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
    materialized still uses the staged operators."""
    import pandas as pd

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
                wav = encode_audio_wav(pcm, sample_rate)
                samples, r = decode_audio_wav(wav)
                rows["sample_rate"].append(sample_rate)
                rows["n_samples"].append(n)
                rows["n_bytes"].append(len(wav))
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
