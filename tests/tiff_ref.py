"""ctypes harness around the system libtiff — external reference for
JPEG-in-TIFF (functions/tiff.py compression 7). Import-guarded: tests
skip when the shared library is absent. Public libtiff API only."""

from __future__ import annotations

import ctypes
import ctypes.util
import os
import tempfile

import numpy as np

_TAGS = dict(
    IMAGEWIDTH=256, IMAGELENGTH=257, BITSPERSAMPLE=258, COMPRESSION=259,
    PHOTOMETRIC=262, SAMPLESPERPIXEL=277, ROWSPERSTRIP=278,
    PLANARCONFIG=284, PREDICTOR=317, TILEWIDTH=322, TILELENGTH=323,
    JPEGQUALITY=65537, JPEGCOLORMODE=65538,
)

_COMP_IDS = {"none": 1, "lzw": 5, "deflate": 8, "packbits": 32773}


def load_libtiff():
    for name in ("libtiff.so.6", "libtiff.so.5", "libtiff.so", "tiff"):
        try:
            if name == "tiff":
                path = ctypes.util.find_library("tiff")
                if not path:
                    continue
                name = path
            lib = ctypes.CDLL(name)
            break
        except OSError:
            continue
    else:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFSetField.restype = ctypes.c_int  # variadic: wrap args manually
    lib.TIFFWriteScanline.restype = ctypes.c_int
    lib.TIFFWriteScanline.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint16
    ]
    lib.TIFFWriteEncodedTile.restype = ctypes.c_ssize_t
    lib.TIFFWriteEncodedTile.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_ssize_t
    ]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    lib.TIFFReadRGBAImageOriented.restype = ctypes.c_int
    lib.TIFFReadRGBAImageOriented.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint32,
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
    ]
    return lib


LIB = load_libtiff()


def _setf(lib, tif, tag, *vals):
    # variadic call: the handle MUST be re-wrapped as c_void_p (a bare
    # Python int would be passed as a truncated 32-bit c_int)
    return lib.TIFFSetField(
        ctypes.c_void_p(tif), ctypes.c_uint32(tag),
        *[ctypes.c_int(v) for v in vals],
    )


def write_jpeg_tiff(arr: np.ndarray, quality: int = 92,
                    rows_per_strip: int = 16) -> bytes:
    """libtiff writes an HxWx3 RGB array as new-style JPEG-in-TIFF
    (COMPRESSION_JPEG, PHOTOMETRIC_YCBCR, RGB color-mode conversion)."""
    h, w, _ = arr.shape
    path = tempfile.mktemp(suffix=".tif")
    tif = LIB.TIFFOpen(path.encode(), b"w")
    if not tif:
        raise RuntimeError("TIFFOpen(w) failed")
    try:
        for key, v in [
            ("IMAGEWIDTH", w), ("IMAGELENGTH", h), ("BITSPERSAMPLE", 8),
            ("SAMPLESPERPIXEL", 3), ("COMPRESSION", 7), ("PHOTOMETRIC", 6),
            ("JPEGQUALITY", quality), ("JPEGCOLORMODE", 1),
            ("PLANARCONFIG", 1), ("ROWSPERSTRIP", rows_per_strip),
        ]:
            if _setf(LIB, tif, _TAGS[key], v) != 1:
                raise RuntimeError(f"TIFFSetField({key}) failed")
        buf = np.ascontiguousarray(arr)
        for r in range(h):
            if LIB.TIFFWriteScanline(tif, buf[r].ctypes.data, r, 0) != 1:
                raise RuntimeError(f"TIFFWriteScanline row {r} failed")
    finally:
        LIB.TIFFClose(tif)
    try:
        return open(path, "rb").read()
    finally:
        os.unlink(path)


def read_rgb(data: bytes, w: int, h: int) -> np.ndarray:
    """libtiff decodes any TIFF payload to HxWx3 RGB (top-left origin)."""
    path = tempfile.mktemp(suffix=".tif")
    open(path, "wb").write(data)
    try:
        tif = LIB.TIFFOpen(path.encode(), b"r")
        if not tif:
            raise RuntimeError("TIFFOpen(r) failed — stream rejected")
        try:
            raster = np.zeros(w * h, dtype=np.uint32)
            ok = LIB.TIFFReadRGBAImageOriented(
                tif, w, h, raster.ctypes.data, 1, 0  # ORIENTATION_TOPLEFT
            )
            if not ok:
                raise RuntimeError("TIFFReadRGBAImageOriented failed")
        finally:
            LIB.TIFFClose(tif)
        return (
            np.stack(
                [raster & 0xFF, (raster >> 8) & 0xFF, (raster >> 16) & 0xFF],
                -1,
            )
            .reshape(h, w, 3)
            .astype(np.uint8)
        )
    finally:
        os.unlink(path)


def write_tiff(arr: np.ndarray, compression: str = "lzw", predictor: int = 1,
               tiled: tuple | None = None, bigtiff: bool = False) -> bytes:
    """libtiff writes an HxWx3 RGB array: strip- or tile-based, classic
    or BigTIFF, any of the basic compressions."""
    h, w, _ = arr.shape
    path = tempfile.mktemp(suffix=".tif")
    tif = LIB.TIFFOpen(path.encode(), b"w8" if bigtiff else b"w")
    if not tif:
        raise RuntimeError("TIFFOpen(w) failed")
    try:
        fields = [
            ("IMAGEWIDTH", w), ("IMAGELENGTH", h), ("BITSPERSAMPLE", 8),
            ("SAMPLESPERPIXEL", 3), ("COMPRESSION", _COMP_IDS[compression]),
            ("PHOTOMETRIC", 2), ("PLANARCONFIG", 1),
        ]
        if predictor != 1:
            fields.append(("PREDICTOR", predictor))
        if tiled:
            tw, tl = tiled
            fields += [("TILEWIDTH", tw), ("TILELENGTH", tl)]
        else:
            fields.append(("ROWSPERSTRIP", 16))
        for key, v in fields:
            if _setf(LIB, tif, _TAGS[key], v) != 1:
                raise RuntimeError(f"TIFFSetField({key}) failed")
        # MUST be a private copy: libtiff's predictor encode differences
        # the caller's buffer IN PLACE (PredictorEncodeRow)
        buf = np.array(arr, dtype=np.uint8, copy=True)
        if tiled:
            tw, tl = tiled
            ntx, nty = -(-w // tw), -(-h // tl)
            tile_no = 0
            for ty in range(nty):
                for tx in range(ntx):
                    tile = np.zeros((tl, tw, 3), np.uint8)
                    ys, xs = ty * tl, tx * tw
                    sub = buf[ys : ys + tl, xs : xs + tw]
                    tile[: sub.shape[0], : sub.shape[1]] = sub
                    tile = np.ascontiguousarray(tile)
                    if LIB.TIFFWriteEncodedTile(
                        tif, tile_no, tile.ctypes.data, tile.nbytes
                    ) < 0:
                        raise RuntimeError(f"WriteEncodedTile {tile_no}")
                    tile_no += 1
        else:
            for r in range(h):
                if LIB.TIFFWriteScanline(tif, buf[r].ctypes.data, r, 0) != 1:
                    raise RuntimeError(f"TIFFWriteScanline row {r} failed")
    finally:
        LIB.TIFFClose(tif)
    try:
        return open(path, "rb").read()
    finally:
        os.unlink(path)
