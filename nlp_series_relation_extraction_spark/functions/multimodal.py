"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a typed metadata
struct; decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages.

The decode step is REAL and pure-numpy for PPM (P6), 24-bit BMP, JPEG
incl. progressive and arithmetic-coded (functions/jpeg.py,
functions/jpeg_arith.py), PNG (functions/png.py), TIFF in
none/LZW/deflate/PackBits AND new-style JPEG-in-TIFF (functions/tiff.py),
and WebP both lossy and lossless (functions/vp8.py, functions/vp8l.py)
— the whole decode -> resize -> feature path runs without PIL/opencv,
including the compressed codecs — and animated WebP (VP8X/ANIM/ANMF
compositing, frame_extract). ``decode_image`` raises
``NotImplementedError`` only for genuinely unknown formats (the one
place to plug PIL/opencv for them); the surrounding Spark plumbing is
format-agnostic either way.
Video is modeled as a stack of fixed-size PPM frames in one payload;
``frame_sample`` slices real frame bytes.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id bigint, content binary, "
    "meta struct<format:string, width:int, height:int, n_frames:int>"
)

FEATURE_DIM = 32

# --- pure-numpy codecs (PPM P6 encode/decode, 24-bit BMP decode) -------------


def encode_image_ppm(arr: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as binary PPM (P6)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w = a.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_image_bmp24(arr: np.ndarray) -> bytes:
    """Encode an HxWx3 uint8 array as an uncompressed 24-bit BMP
    (bottom-up, BGR, 4-byte-padded rows — the layout _decode_bmp24 reads)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    h, w = a.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)
    data = rows.tobytes()
    off = 14 + 40
    header = (
        b"BM"
        + (off + len(data)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + off.to_bytes(4, "little")
    )
    dib = (
        (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    return header + dib + data


def _decode_ppm(content: bytes) -> np.ndarray:
    """Binary PPM (P6) -> HxWx3 uint8. Handles whitespace/comment headers."""
    if content[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # tokenize the header: magic, width, height, maxval (comments start '#')
    tokens: list[bytes] = []
    i = 2
    while len(tokens) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        tokens.append(content[i:j])
        i = j
    i += 1  # single whitespace after maxval, then raster
    w, h, maxval = (int(t) for t in tokens)
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    raster = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i)
    return raster.reshape(h, w, 3).copy()


def _decode_bmp24(content: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP -> HxWx3 uint8 (RGB). Rows are 4-byte padded
    and stored bottom-up (negative height = top-down), pixels BGR."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int.from_bytes(content[10:14], "little")
    w = int.from_bytes(content[18:22], "little", signed=True)
    h = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    comp = int.from_bytes(content[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def decode_image(content: bytes, fmt: str) -> np.ndarray:
    """Boundary contract for the pipeline: decode or raise ValueError /
    NotImplementedError, NEVER a decoder-internal exception class. A
    malformed stream can crash any depth of a pure-numpy codec
    (IndexError in a Huffman walk, zlib.error in a PNG inflate,
    struct.error in a truncated header); extract_features' documented
    fallback catches exactly (ValueError, NotImplementedError), so this
    single choke point re-raises everything else as ValueError — the
    per-codec test suites call the format decoders DIRECTLY and stay
    strict. Pinned by tests/test_codec_fuzz.py."""
    try:
        return _decode_image_dispatch(content, fmt)
    except (ValueError, NotImplementedError):
        raise
    except Exception as e:
        raise ValueError(
            f"malformed {fmt!r} payload: {type(e).__name__}: {e}"
        ) from e


def _decode_image_dispatch(content: bytes, fmt: str) -> np.ndarray:
    """Decode an encoded image payload to an HxWx3 uint8 array.

    REAL, pure numpy, no external codec: uncompressed PPM (P6) and 24-bit
    BMP; JPEG (functions/jpeg.py — Huffman + DCT, 4:4:4 / 4:2:2 / 4:2:0,
    grayscale or YCbCr, restart markers, baseline AND progressive SOF2,
    sniffed from the stream); PNG (functions/png.py — stdlib zlib inflate,
    all five scanline filters, every legal bit depth, Adam7 interlacing,
    grey/truecolor/indexed/alpha); TIFF (functions/tiff.py — both byte
    orders, strip-based, compressions none/LZW/deflate/PackBits,
    horizontal predictor, and new-style JPEG-in-TIFF with shared
    JPEGTables); WebP lossy (functions/vp8.py — full RFC 6386 VP8
    keyframe decode, bit-exact vs libwebp incl. both loop filters) and
    lossless (functions/vp8l.py — full VP8L bitstream, byte-exact).
    Animated WebP composites through decode_webp_animation (first frame
    here, every frame in frame_extract). Unknown formats are the one
    documented integration point (plug PIL/opencv here); everything
    around this function (schemas, Arrow batching, resize, features) is
    format-agnostic."""
    f = (fmt or "").lower()
    if f in ("image/ppm", "ppm"):
        return _decode_ppm(content)
    if f in ("image/bmp", "bmp"):
        return _decode_bmp24(content)
    if f in ("image/jpeg", "image/jpg", "jpeg", "jpg",
             "image/jpeg-progressive", "image/jpeg-arithmetic"):
        # one decoder: it sniffs SOF0/1 vs SOF2 vs SOF9 from the stream
        from .jpeg import decode_image_jpeg

        return decode_image_jpeg(content)
    if f in ("image/png", "png"):
        from .png import decode_image_png

        return decode_image_png(content)
    if f in (
        "image/tiff", "image/tif", "tiff", "tif",
        "image/tiff-lzw", "image/tiff-deflate", "image/tiff-packbits",
        "image/tiff-jpeg",
    ):
        from .tiff import decode_image_tiff

        return decode_image_tiff(content)
    if f in ("image/webp", "webp"):
        from .vp8 import decode_image_webp

        return decode_image_webp(content)
    if f in ("image/gif", "gif"):
        from .gif import decode_image_gif

        return decode_image_gif(content)
    if f in ("video/webp-anim", "image/webp-anim"):
        from .vp8 import decode_webp_animation

        return decode_webp_animation(content)[0][0][..., :3].copy()
    if f in ("video/avi-mjpeg", "avi"):
        from .avi import decode_avi_mjpeg

        return decode_avi_mjpeg(content, frame_indices=[0])[0][0]
    raise NotImplementedError(
        f"no built-in decoder for {fmt!r} — integrate PIL/opencv here; "
        "ppm/bmp/jpeg(baseline+progressive+arithmetic)/png/tiff(none+lzw+"
        "deflate+packbits+jpeg)/webp(lossy+lossless+animated)/gif(static+"
        "animated)/avi-mjpeg decode natively"
    )


def resize_image(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy index map) -> height x width x C."""
    h, w = arr.shape[:2]
    ri = (np.arange(height) * h // height).clip(0, h - 1)
    ci = (np.arange(width) * w // width).clip(0, w - 1)
    return arr[ri][:, ci]


def image_features(arr: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic REAL features from decoded pixels: per-channel
    mean/std/min/max (12) + a 4x5 grayscale thumbnail (20) = 32 dims."""
    a = arr.astype(np.float32)
    stats = np.concatenate(
        [
            a.mean(axis=(0, 1)),
            a.std(axis=(0, 1)),
            a.min(axis=(0, 1)),
            a.max(axis=(0, 1)),
        ]
    )
    gray = a.mean(axis=2)
    thumb = resize_image(gray[:, :, None], 5, 4)[:, :, 0].reshape(-1)
    out = np.concatenate([stats, thumb]).astype(np.float32)
    assert out.shape[0] == dim
    return out


# --- synthetic media source ---------------------------------------------------


def _synth_pixels(seed_bytes: bytes, w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(
        int.from_bytes(hashlib.md5(seed_bytes).digest()[:8], "little")
    )
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def synthesize_media(
    df: DataFrame,
    id_col: str,
    text_col: str,
    formats: tuple[str, ...] = ("image/ppm",),
) -> DataFrame:
    """Deterministic media table from a text table: payload bytes are REAL
    encoded images (md5-seeded pixels, dims derived from text length), so
    the decode -> resize -> feature path runs on genuine encoded bytes.

    ``formats`` cycles per media_id across the built-in codecs
    ('image/ppm', 'image/bmp', 'image/jpeg', 'image/png') — pass several
    for a mixed-codec corpus exercising every decoder."""
    import pandas as pd

    def gen(batches):
        from .jpeg import encode_image_jpeg, encode_image_jpeg_progressive

        from .png import encode_image_png

        from .tiff import encode_image_tiff, encode_image_tiff_jpeg

        from .gif import encode_image_gif

        from .jpeg_arith import encode_image_jpeg_arith

        from .vp8 import encode_image_webp

        encoders = {
            "image/ppm": encode_image_ppm,
            "image/bmp": encode_image_bmp24,
            "image/jpeg": lambda a: encode_image_jpeg(
                a, quality=90, subsampling="420"
            ),
            "image/jpeg-progressive": lambda a: encode_image_jpeg_progressive(
                a, quality=90, subsampling="420"
            ),
            "image/png": encode_image_png,
            "image/tiff": encode_image_tiff,
            # compressed TIFF variants real scanner/libtiff corpora
            # actually contain: LZW+predictor, zlib deflate, PackBits RLE
            "image/tiff-lzw": lambda a: encode_image_tiff(
                a, compression="lzw", predictor=2
            ),
            "image/tiff-deflate": lambda a: encode_image_tiff(
                a, compression="deflate", predictor=2
            ),
            "image/tiff-packbits": lambda a: encode_image_tiff(
                a, compression="packbits"
            ),
            "image/webp": lambda a: encode_image_webp(a, quality=90.0),
            # lossy TIFF as scanners/exports emit it: new-style JPEG
            # strips + shared JPEGTables (TTN2)
            "image/tiff-jpeg": lambda a: encode_image_tiff_jpeg(
                a, quality=90
            ),
            "image/jpeg-arithmetic": lambda a: encode_image_jpeg_arith(
                a, quality=90, subsampling="420"
            ),
            "image/gif": encode_image_gif,
        }
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "content": [],
                "format": [],
                "width": [],
                "height": [],
                "n_frames": [],
            }
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                t = (text or "").encode("utf-8")
                w, h = len(t) % 24 + 4, len(t) % 16 + 4
                fmt = formats[int(mid) % len(formats)]
                out["content"].append(encoders[fmt](_synth_pixels(t, w, h)))
                out["format"].append(fmt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(1)
            yield pd.DataFrame(out)

    from .partitioning import ensure_parallelism as _spread

    flat = _spread(
        df.select(
            F.col(id_col).alias("media_id"), F.col(text_col).alias("text")
        )
    ).mapInPandas(
        gen,
        schema="media_id bigint, content binary, format string, width int, "
        "height int, n_frames int",
    )
    return flat.select(
        "media_id",
        "content",
        F.struct("format", "width", "height", "n_frames").alias("meta"),
    )


def synthesize_video(
    df: DataFrame, id_col: str, text_col: str, n_frames: int = 6,
    width: int = 8, height: int = 6, container: str = "ppm-stack",
) -> DataFrame:
    """Video payloads: ``n_frames`` frames in one binary column —
    concatenated PPM frames ("ppm-stack", every frame the same byte size
    so slicing is exact), a REAL animated WebP ("webp-anim": VP8X/ANIM/
    ANMF container, lossy VP8 frames, functions/vp8.py), or a REAL
    animated GIF ("gif-anim", functions/gif.py)."""
    import pandas as pd

    def gen(batches):
        from .vp8 import encode_webp_animation

        for pdf in batches:
            rows = {"media_id": pdf["media_id"], "content": [],
                    "format": [], "width": [], "height": [], "n_frames": []}
            for text in pdf["text"]:
                t = (text or "").encode("utf-8")
                pix = [
                    _synth_pixels(t + bytes([k]), width, height)
                    for k in range(n_frames)
                ]
                if container == "webp-anim":
                    payload = encode_webp_animation(
                        pix, [100] * n_frames, quality=90.0
                    )
                    fmt = "video/webp-anim"
                elif container == "gif-anim":
                    from .gif import encode_gif_animation

                    payload = encode_gif_animation(pix, [100] * n_frames)
                    fmt = "video/gif-anim"
                elif container == "avi-mjpeg":
                    from .avi import encode_video_avi_mjpeg

                    payload = encode_video_avi_mjpeg(pix, fps=10, quality=90)
                    fmt = "video/avi-mjpeg"
                else:
                    payload = b"".join(encode_image_ppm(p) for p in pix)
                    fmt = "video/ppm-stack"
                rows["content"].append(payload)
                rows["format"].append(fmt)
                rows["width"].append(width)
                rows["height"].append(height)
                rows["n_frames"].append(n_frames)
            yield pd.DataFrame(rows)

    from .partitioning import ensure_parallelism as _spread

    flat = _spread(
        df.select(
            F.col(id_col).alias("media_id"), F.col(text_col).alias("text")
        )
    ).mapInPandas(
        gen,
        schema="media_id bigint, content binary, format string, width int, "
        "height int, n_frames int",
    )
    return flat.select(
        "media_id",
        "content",
        F.struct("format", "width", "height", "n_frames").alias("meta"),
    )


# --- distributed stages --------------------------------------------------------


def _fake_features(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in feature vector (md5-seeded) for payloads whose
    format has no built-in decoder — keeps the pipeline total."""
    h = hashlib.md5(content or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


def extract_features(media: DataFrame, batch_note: bool = False) -> DataFrame:
    """media -> (media_id, width, height, n_bytes, features array<float>).

    Arrow-batched mapInPandas: decodable payloads (ppm/bmp) go through the
    REAL decode -> image_features path; undecodable formats fall back to the
    clearly-marked deterministic fake so the pipeline stays total."""
    import pandas as pd

    schema = (
        "media_id bigint, width int, height int, n_bytes int, "
        "features array<float>"
    )

    def run(batches):
        for pdf in batches:
            feats = []
            for c, fmt in zip(pdf["content"], pdf["format"]):
                if c is None:
                    feats.append(_fake_features(c).tolist())
                    continue
                try:
                    feats.append(image_features(decode_image(c, fmt)).tolist())
                except (NotImplementedError, ValueError):
                    feats.append(_fake_features(c).tolist())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["width"],
                    "height": pdf["height"],
                    "n_bytes": [
                        len(c) if c is not None else 0 for c in pdf["content"]
                    ],
                    "features": feats,
                }
            )

    flat = media.select(
        "media_id",
        "content",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return flat.mapInPandas(run, schema=schema)


def frame_sample(media: DataFrame, every_n: int = 5) -> DataFrame:
    """(media_id, frame_idx) for frames 0, every_n, 2*every_n, ... — the
    index-only sampling plan (no payload movement until frames are needed)."""
    return media.select(
        "media_id",
        F.explode(
            F.expr(f"sequence(0, meta.n_frames - 1, {every_n})")
        ).alias("frame_idx"),
    )


def synthesize_video_frame_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_frames: int = 6,
    width: int = 16,
    height: int = 12,
    every_n: int = 2,
    containers: tuple[str, ...] = ("avi-mjpeg", "gif-anim", "ppm-stack"),
) -> DataFrame:
    """Fused synth -> encode -> selective-decode -> per-frame stats in ONE
    Arrow pass: (media_id, container, frame_idx, mean_r).

    Same fusion rationale as audio.synthesize_audio_features: the staged
    path (synthesize_video |> frame_extract |> stats) chains THREE
    mapInPandas stages, i.e. three piped python workers PER TASK — the
    multi-KB payload crosses the Arrow boundary at every hop and a long
    session carries ~3x the worker pool (measured: the staged driver
    query ran 4-7x slower inside the full bench session than standalone,
    pure worker/pipe overhead). Container cycles by id over
    ``containers``; AVI decodes ONLY the sampled chunk indices.
    Fused == staged is pinned in tests/test_avi.py.
    """
    import pandas as pd

    def run(batches):
        from .avi import decode_avi_mjpeg, encode_video_avi_mjpeg
        from .gif import decode_gif_animation, encode_gif_animation

        for pdf in batches:
            out = {"media_id": [], "container": [], "frame_idx": [],
                   "mean_r": []}
            for mid, text in zip(pdf["media_id"], pdf["text"]):
                t = (text or "").encode("utf-8")
                pix = [
                    _synth_pixels(t + bytes([k]), width, height)
                    for k in range(n_frames)
                ]
                cont = containers[int(mid) % len(containers)]
                wanted = list(range(0, n_frames, every_n))
                if cont == "avi-mjpeg":
                    payload = encode_video_avi_mjpeg(pix, fps=10, quality=90)
                    frames = decode_avi_mjpeg(payload, wanted)[0]
                elif cont == "gif-anim":
                    payload = encode_gif_animation(pix, [100] * n_frames)
                    full, _durs = decode_gif_animation(payload)
                    frames = [full[k] for k in wanted]
                else:
                    frames = [pix[k] for k in wanted]
                for k, fr in zip(wanted, frames):
                    out["media_id"].append(mid)
                    out["container"].append(cont)
                    out["frame_idx"].append(k)
                    out["mean_r"].append(
                        round(float(np.asarray(fr)[..., 0].mean()), 4)
                    )
            yield pd.DataFrame(out)

    from .partitioning import ensure_parallelism as _spread_local

    return _spread_local(
        df.select(
            F.col(id_col).alias("media_id"), F.col(text_col).alias("text")
        )
    ).mapInPandas(
        run,
        schema="media_id bigint, container string, frame_idx int,"
        " mean_r double",
    )


def frame_extract(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Materialize REAL sampled frame bytes from stacked-PPM video payloads:
    (media_id, frame_idx, frame binary). Every frame has identical byte size
    (fixed dims), so the slice offsets are exact arithmetic."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame": []}
            for mid, c, fmt, w, h, n in zip(
                pdf["media_id"], pdf["content"], pdf["format"],
                pdf["width"], pdf["height"], pdf["n_frames"],
            ):
                # NULL-media hardening (mirrors extract_features): a None
                # payload or a null/NaN frame count row yields no frames
                if c is None or fmt not in (
                    "video/ppm-stack", "video/webp-anim", "video/gif-anim",
                    "video/avi-mjpeg",
                ):
                    continue
                if n is None or pd.isna(n) or int(n) <= 0:
                    continue
                if fmt == "video/avi-mjpeg":
                    # container demux decodes ONLY the sampled frames —
                    # the chunk walk is header arithmetic, the codec runs
                    # len(sampled)/n of the time (functions/avi.py)
                    from .avi import decode_avi_mjpeg

                    wanted = list(range(0, int(n), every_n))
                    frames, _fps, _info = decode_avi_mjpeg(bytes(c), wanted)
                    for k, fr in zip(wanted, frames):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(k)
                        out["frame"].append(encode_image_ppm(fr))
                    continue
                if fmt in ("video/webp-anim", "video/gif-anim"):
                    # decode + composite once, emit sampled frames as PPM
                    # so downstream consumers see one frame format
                    if fmt == "video/webp-anim":
                        from .vp8 import decode_webp_animation as dec_anim
                    else:
                        from .gif import decode_gif_animation as dec_anim

                    frames, _durs = dec_anim(bytes(c))
                    for k in range(0, min(int(n), len(frames)), every_n):
                        out["media_id"].append(mid)
                        out["frame_idx"].append(k)
                        out["frame"].append(
                            encode_image_ppm(frames[k][..., :3])
                        )
                    continue
                fsize = len(c) // int(n)
                for k in range(0, int(n), every_n):
                    out["media_id"].append(mid)
                    out["frame_idx"].append(k)
                    out["frame"].append(c[k * fsize : (k + 1) * fsize])
            yield pd.DataFrame(out)

    flat = media.select(
        "media_id",
        "content",
        F.col("meta.format").alias("format"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_frames").alias("n_frames"),
    )
    return flat.mapInPandas(
        run, schema="media_id bigint, frame_idx int, frame binary"
    )
