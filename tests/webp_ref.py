"""ctypes harness around the system libwebp — the conformance reference
for functions/vp8.py. Import-guarded: tests skip when the shared library
is absent. Public API only (decode.h / encode.h of libwebp)."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np


def load_libwebp():
    for name in ("libwebp.so.7", "libwebp.so", "webp"):
        try:
            if name == "webp":
                path = ctypes.util.find_library("webp")
                if not path:
                    continue
                name = path
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        return None
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    return lib


LIB = load_libwebp()


def encode_rgb(arr: np.ndarray, quality: float) -> bytes:
    """Lossy-encode an HxWx3 RGB array with libwebp's simple API."""
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeRGB(
        np.ascontiguousarray(arr).tobytes(), w, h, w * 3,
        quality, ctypes.byref(out),
    )
    if n == 0:
        raise RuntimeError("WebPEncodeRGB failed")
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def encode_lossless_rgb(arr: np.ndarray) -> bytes:
    """Lossless-encode an HxWx3 RGB array (produces a VP8L stream)."""
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeLosslessRGB(
        np.ascontiguousarray(arr).tobytes(), w, h, w * 3, ctypes.byref(out)
    )
    if n == 0:
        raise RuntimeError("WebPEncodeLosslessRGB failed")
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def encode_lossless_rgba(arr: np.ndarray) -> bytes:
    """Lossless-encode an HxWx4 RGBA array (exercises real alpha)."""
    h, w, _ = arr.shape
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = LIB.WebPEncodeLosslessRGBA(
        np.ascontiguousarray(arr).tobytes(), w, h, w * 4, ctypes.byref(out)
    )
    if n == 0:
        raise RuntimeError("WebPEncodeLosslessRGBA failed")
    data = ctypes.string_at(out, n)
    LIB.WebPFree(out)
    return data


def decode_yuv(data: bytes):
    """Decode to native (Y, U, V) 4:2:0 planes via WebPDecodeYUV."""
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = ctypes.POINTER(ctypes.c_uint8)()
    v = ctypes.POINTER(ctypes.c_uint8)()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = LIB.WebPDecodeYUV(
        data, len(data), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not y:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    ch, cw = (H + 1) >> 1, (W + 1) >> 1
    Y = np.ctypeslib.as_array(y, shape=(H, S))[:, :W].copy()
    U = np.ctypeslib.as_array(u, shape=(ch, US))[:, :cw].copy()
    V = np.ctypeslib.as_array(v, shape=(ch, US))[:, :cw].copy()
    LIB.WebPFree(y)
    return Y, U, V


# --- advanced decoder API (WebPDecode with options) -------------------------


class _WebPBitstreamFeatures(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int), ("height", ctypes.c_int),
        ("has_alpha", ctypes.c_int), ("has_animation", ctypes.c_int),
        ("format", ctypes.c_int), ("pad", ctypes.c_uint32 * 5),
    ]


class _WebPRGBABuffer(ctypes.Structure):
    _fields_ = [
        ("rgba", ctypes.POINTER(ctypes.c_uint8)),
        ("stride", ctypes.c_int), ("size", ctypes.c_size_t),
    ]


class _WebPYUVABuffer(ctypes.Structure):
    _fields_ = [
        ("y", ctypes.POINTER(ctypes.c_uint8)),
        ("u", ctypes.POINTER(ctypes.c_uint8)),
        ("v", ctypes.POINTER(ctypes.c_uint8)),
        ("a", ctypes.POINTER(ctypes.c_uint8)),
        ("y_stride", ctypes.c_int), ("u_stride", ctypes.c_int),
        ("v_stride", ctypes.c_int), ("a_stride", ctypes.c_int),
        ("y_size", ctypes.c_size_t), ("u_size", ctypes.c_size_t),
        ("v_size", ctypes.c_size_t), ("a_size", ctypes.c_size_t),
    ]


class _BufferUnion(ctypes.Union):
    _fields_ = [("RGBA", _WebPRGBABuffer), ("YUVA", _WebPYUVABuffer)]


class _WebPDecBuffer(ctypes.Structure):
    _fields_ = [
        ("colorspace", ctypes.c_int), ("width", ctypes.c_int),
        ("height", ctypes.c_int), ("is_external_memory", ctypes.c_int),
        ("u", _BufferUnion), ("pad", ctypes.c_uint32 * 4),
        ("private_memory", ctypes.POINTER(ctypes.c_uint8)),
    ]


class _WebPDecoderOptions(ctypes.Structure):
    _fields_ = [
        ("bypass_filtering", ctypes.c_int),
        ("no_fancy_upsampling", ctypes.c_int),
        ("use_cropping", ctypes.c_int),
        ("crop_left", ctypes.c_int), ("crop_top", ctypes.c_int),
        ("crop_width", ctypes.c_int), ("crop_height", ctypes.c_int),
        ("use_scaling", ctypes.c_int),
        ("scaled_width", ctypes.c_int), ("scaled_height", ctypes.c_int),
        ("use_threads", ctypes.c_int),
        ("dithering_strength", ctypes.c_int),
        ("flip", ctypes.c_int),
        ("alpha_dithering_strength", ctypes.c_int),
        ("pad", ctypes.c_uint32 * 5),
    ]


class _WebPDecoderConfig(ctypes.Structure):
    _fields_ = [
        ("input", _WebPBitstreamFeatures),
        ("output", _WebPDecBuffer),
        ("options", _WebPDecoderOptions),
    ]


_MODE_YUV = 11


def decode_yuv_nofilter(data: bytes):
    """Decode with bypass_filtering=1 — libwebp's UNFILTERED
    reconstruction, for localizing decode-vs-loop-filter divergence."""
    cfg = _WebPDecoderConfig()
    for ver in (0x0209, 0x0208, 0x0207, 0x0203):
        if LIB.WebPInitDecoderConfigInternal(ctypes.byref(cfg), ver):
            break
    else:
        raise RuntimeError("WebPInitDecoderConfig: no ABI version accepted")
    cfg.options.bypass_filtering = 1
    cfg.output.colorspace = _MODE_YUV
    status = LIB.WebPDecode(data, len(data), ctypes.byref(cfg))
    if status != 0:
        raise RuntimeError(f"WebPDecode status={status}")
    W, H = cfg.output.width, cfg.output.height
    yb = cfg.output.u.YUVA
    ch, cw = (H + 1) >> 1, (W + 1) >> 1
    Y = np.ctypeslib.as_array(yb.y, shape=(H, yb.y_stride))[:, :W].copy()
    U = np.ctypeslib.as_array(yb.u, shape=(ch, yb.u_stride))[:, :cw].copy()
    V = np.ctypeslib.as_array(yb.v, shape=(ch, yb.v_stride))[:, :cw].copy()
    LIB.WebPFreeDecBuffer(ctypes.byref(cfg.output))
    return Y, U, V
