"""Fails-closed fuzz of the pipeline decode boundaries.

extract_features / extract_audio_features keep the pipeline total by
catching exactly (ValueError, NotImplementedError) around decode — so
the decode entry points (multimodal.decode_image, audio.decode_audio)
must NEVER let a decoder-internal exception class (IndexError,
struct.error, zlib.error, ZeroDivisionError, ...) escape on malformed
bytes: that would crash the whole Arrow batch instead of falling back
row-wise. Strategy: take ONE real payload per codec from our own
encoders, then hypothesis-mutate it (byte flips x truncation) plus raw
random bytes, asserting the boundary contract.

The per-codec precision suites (test_jpeg/png/tiff/flac/...) call the
format decoders directly and stay strict; this file tests only the
pipeline boundary that wraps them."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nlp_series_relation_extraction_spark.functions.audio import (
    decode_audio,
    encode_audio_wav,
)
from nlp_series_relation_extraction_spark.functions.multimodal import (
    decode_image,
    encode_image_bmp24,
    encode_image_ppm,
)

_OK = (ValueError, NotImplementedError)


def _img(h=24, w=16, seed=5):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _payloads():
    from nlp_series_relation_extraction_spark.functions.flac import (
        encode_audio_flac,
    )
    from nlp_series_relation_extraction_spark.functions.gif import (
        encode_image_gif,
    )
    from nlp_series_relation_extraction_spark.functions.jpeg import (
        encode_image_jpeg,
    )
    from nlp_series_relation_extraction_spark.functions.png import (
        encode_image_png,
    )
    from nlp_series_relation_extraction_spark.functions.tiff import (
        encode_image_tiff,
    )

    arr = _img()
    pcm = (
        0.4 * np.sin(2 * np.pi * 440 * np.arange(600) / 8000) * 32767
    ).astype(np.int16)
    return [
        ("image/ppm", encode_image_ppm(arr)),
        ("image/bmp", encode_image_bmp24(arr)),
        ("image/jpeg", encode_image_jpeg(arr)),
        ("image/png", encode_image_png(arr)),
        ("image/tiff", encode_image_tiff(arr, compression="lzw")),
        ("image/gif", encode_image_gif(arr)),
        ("audio", encode_audio_wav(pcm, 8000, codec="msadpcm")),
        ("audio", encode_audio_flac(pcm, 8000)),
    ]


@pytest.mark.parametrize(
    "fmt,payload", _payloads(), ids=lambda v: v if isinstance(v, str) else ""
)
def test_mutated_payloads_fail_closed(fmt, payload):
    decode = (
        (lambda b: decode_audio(b))
        if fmt == "audio"
        else (lambda b: decode_image(b, fmt))
    )
    # the pristine payload must decode (guards against vacuous fuzzing)
    decode(payload)

    @settings(max_examples=150, deadline=None)
    @given(
        st.integers(0, len(payload) - 1),
        st.integers(0, 255),
        st.integers(1, len(payload)),
    )
    def fuzz(pos, byte, cut):
        mutated = bytearray(payload[:cut])
        if pos < len(mutated):
            mutated[pos] = byte
        try:
            decode(bytes(mutated))
        except _OK:
            pass

    fuzz()


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=120), st.sampled_from(
    ["image/ppm", "image/bmp", "image/jpeg", "image/png", "image/tiff",
     "image/gif", "image/webp"]
))
def test_random_bytes_fail_closed_images(payload, fmt):
    try:
        decode_image(payload, fmt)
    except _OK:
        pass


@settings(max_examples=150, deadline=None)
@given(st.binary(max_size=120))
def test_random_bytes_fail_closed_audio(payload):
    try:
        decode_audio(payload)
    except _OK:
        pass
