"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages. The decode step itself is STUBBED (no image/audio
libraries in this container): ``decode_image`` raises ``NotImplementedError``
unless PIL is importable, and the feature extractor falls back to a clearly
marked deterministic fake (md5-seeded vector) — the Spark-side plumbing
(schema, partitioning, UDF signature, Arrow batch shape) is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except Exception:
    _HAS_PIL = False

MEDIA_SCHEMA = (
    "media_id bigint, content binary, "
    "meta struct<format:string, width:int, height:int, n_frames:int>"
)

FEATURE_DIM = 32


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text table: payload bytes are
    the utf-8 text (stand-in for encoded pixels), metadata derived from
    content length. Lets the pipeline run end-to-end without real codecs."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.struct(
            F.lit("fake/raw").alias("format"),
            (F.length(text_col) % 640 + 16).cast("int").alias("width"),
            (F.length(text_col) % 480 + 16).cast("int").alias("height"),
            (F.length(text_col) % 30 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(content: bytes, fmt: str) -> "np.ndarray":
    """Decode an encoded image payload to an HxWx3 array.

    STUB: real decoding needs PIL/opencv, absent from this runtime.
    """
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL/opencv (not available in this runtime); "
            "plug a real decoder in here — the surrounding Spark plumbing is "
            "format-agnostic"
        )
    raise NotImplementedError("real decoder integration point")


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector (md5-seeded); replaces the
    decode->model path so batch shapes and schemas are exercised."""
    h = hashlib.md5(content or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, batch_note: bool = False) -> DataFrame:
    """media -> (media_id, width, height, n_bytes, features array<float>).

    Arrow-batched mapInPandas: the UDF sees pandas Series of raw bytes and
    the flattened metadata; output is a dense feature column ready for the
    similarity operators. Swap _fake_features for a real decode+model.
    """
    import pandas as pd

    schema = (
        "media_id bigint, width int, height int, n_bytes int, "
        f"features array<float>"
    )

    def run(batches):
        for pdf in batches:
            feats = [
                _fake_features(c).tolist() for c in pdf["content"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": [len(c) if c is not None else 0 for c in pdf["content"]],
                    "features": feats,
                }
            )

    flat = media.select(
        "media_id",
        "content",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Explode fake frame indices (0, every_n, 2*every_n, ...) per media row
    — the video frame-sampling plumbing (real decoders slot into the UDF
    that would materialize each frame's bytes)."""
    return media.select(
        "media_id",
        F.explode(
            F.expr(f"sequence(0, meta.n_frames - 1, {every_n})")
        ).alias("frame_idx"),
    )
