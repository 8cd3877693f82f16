"""Reference harness for GIF: compiles a tiny C helper against the
system giflib (libgif.so.7; the dev header is absent, so the helper
declares the minimal public API itself — giflib 5.x ABI). Used to
cross-check functions/gif.py in both directions. Import-guarded."""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

/* minimal giflib 5.x public API (gif_lib.h is not installed) */
typedef unsigned char GifByteType;
typedef int GifWord;
typedef struct { GifByteType Red, Green, Blue; } GifColorType;
typedef struct {
  int ColorCount, BitsPerPixel;
  _Bool SortFlag;
  GifColorType *Colors;
} ColorMapObject;
typedef struct {
  GifWord Left, Top, Width, Height;
  _Bool Interlace;
  ColorMapObject *ColorMap;
} GifImageDesc;
typedef struct { int ByteCount; GifByteType *Bytes; int Function; } ExtensionBlock;
typedef struct {
  GifImageDesc ImageDesc;
  GifByteType *RasterBits;
  int ExtensionBlockCount;
  ExtensionBlock *ExtensionBlocks;
} SavedImage;
typedef struct {
  GifWord SWidth, SHeight, SColorResolution, SBackGroundColor;
  GifByteType AspectByte;
  ColorMapObject *SColorMap;
  int ImageCount;
  GifImageDesc Image;
  SavedImage *SavedImages;
  int ExtensionBlockCount;
  ExtensionBlock *ExtensionBlocks;
  int Error;
  void *UserData;
  void *Private;
} GifFileType;

extern GifFileType *DGifOpenFileName(const char *, int *);
extern int DGifSlurp(GifFileType *);
extern int DGifCloseFile(GifFileType *, int *);
extern GifFileType *EGifOpenFileName(const char *, _Bool, int *);
extern int EGifPutScreenDesc(GifFileType *, int, int, int, int,
                             const ColorMapObject *);
extern int EGifPutImageDesc(GifFileType *, int, int, int, int, _Bool,
                            const ColorMapObject *);
extern int EGifPutLine(GifFileType *, GifByteType *, int);
extern int EGifCloseFile(GifFileType *, int *);
extern ColorMapObject *GifMakeMapObject(int, const GifColorType *);
extern void GifFreeMapObject(ColorMapObject *);

/* modes:
 *  dec <path>: print "nframes\n" then per frame:
 *      "left top w h interlace ncolors\n", palette bytes, raster bytes
 *  enc <path> <w> <h> <ncolors>: stdin = palette (3*ncolors) + indices
 */

static int do_dec(const char *path) {
  int err = 0;
  GifFileType *g = DGifOpenFileName(path, &err);
  if (!g) return 2;
  if (DGifSlurp(g) != 1) return 3;
  printf("%d\n", g->ImageCount);
  fflush(stdout);
  for (int i = 0; i < g->ImageCount; i++) {
    SavedImage *im = &g->SavedImages[i];
    ColorMapObject *cm = im->ImageDesc.ColorMap ? im->ImageDesc.ColorMap
                                                : g->SColorMap;
    int nc = cm ? cm->ColorCount : 0;
    printf("%d %d %d %d %d %d\n", im->ImageDesc.Left, im->ImageDesc.Top,
           im->ImageDesc.Width, im->ImageDesc.Height,
           (int)im->ImageDesc.Interlace, nc);
    fflush(stdout);
    for (int c = 0; c < nc; c++) {
      GifColorType col = cm->Colors[c];
      fputc(col.Red, stdout); fputc(col.Green, stdout);
      fputc(col.Blue, stdout);
    }
    fwrite(im->RasterBits, 1,
           (size_t)im->ImageDesc.Width * im->ImageDesc.Height, stdout);
    fflush(stdout);
  }
  DGifCloseFile(g, &err);
  return 0;
}

static int do_enc(const char *path, int w, int h, int nc) {
  GifColorType pal[256];
  unsigned char *buf = malloc((size_t)w * h);
  for (int i = 0; i < nc; i++) {
    int r = getchar(), g2 = getchar(), b = getchar();
    pal[i].Red = r; pal[i].Green = g2; pal[i].Blue = b;
  }
  if (fread(buf, 1, (size_t)w * h, stdin) != (size_t)w * h) return 2;
  int err = 0;
  GifFileType *g = EGifOpenFileName(path, 0, &err);
  if (!g) return 3;
  ColorMapObject *cm = GifMakeMapObject(nc, pal);
  if (EGifPutScreenDesc(g, w, h, 8, 0, cm) != 1) return 4;
  if (EGifPutImageDesc(g, 0, 0, w, h, 0, 0) != 1) return 5;
  for (int y = 0; y < h; y++)
    if (EGifPutLine(g, buf + (size_t)y * w, w) != 1) return 6;
  if (EGifCloseFile(g, &err) != 1) return 7;
  GifFreeMapObject(cm);
  free(buf);
  return 0;
}

int main(int argc, char **argv) {
  if (argc == 3 && strcmp(argv[1], "dec") == 0) return do_dec(argv[2]);
  if (argc == 6 && strcmp(argv[1], "enc") == 0)
    return do_enc(argv[2], atoi(argv[3]), atoi(argv[4]), atoi(argv[5]));
  return 64;
}
"""

_HELPER = None


def helper_path():
    global _HELPER
    if _HELPER is not None:
        return _HELPER or None
    _HELPER = False
    try:
        d = tempfile.mkdtemp(prefix="gifref")
        src = os.path.join(d, "helper.c")
        binp = os.path.join(d, "helper")
        with open(src, "w") as f:
            f.write(_C_SRC)
        r = subprocess.run(
            ["gcc", "-O2", "-o", binp, src, "-l:libgif.so.7"],
            capture_output=True, timeout=120,
        )
        if r.returncode == 0:
            _HELPER = binp
    except (OSError, subprocess.SubprocessError):
        pass
    return _HELPER or None


def available() -> bool:
    return helper_path() is not None


def decode_frames(data: bytes):
    """giflib decode -> list of (left, top, interlace, palette [n,3],
    indices [h,w]) — raw indexed frames, no compositing."""
    path = tempfile.mktemp(suffix=".gif")
    open(path, "wb").write(data)
    try:
        r = subprocess.run(
            [helper_path(), "dec", path], capture_output=True, timeout=120
        )
        if r.returncode != 0:
            raise RuntimeError(f"giflib dec failed rc={r.returncode}")
        buf = r.stdout
        nl = buf.index(b"\n")
        n_frames = int(buf[:nl])
        pos = nl + 1
        frames = []
        for _ in range(n_frames):
            nl = buf.index(b"\n", pos)
            left, top, w, h, inter, nc = (
                int(x) for x in buf[pos:nl].split()
            )
            pos = nl + 1
            pal = np.frombuffer(
                buf, dtype=np.uint8, count=3 * nc, offset=pos
            ).reshape(nc, 3).copy()
            pos += 3 * nc
            idx = np.frombuffer(
                buf, dtype=np.uint8, count=w * h, offset=pos
            ).reshape(h, w).copy()
            pos += w * h
            frames.append((left, top, bool(inter), pal, idx))
        return frames
    finally:
        os.unlink(path)


def encode_indexed(pal: np.ndarray, idx: np.ndarray) -> bytes:
    """giflib encode of an indexed image (palette must be a power-of-2
    size <= 256; pad before calling if needed)."""
    h, w = idx.shape
    path = tempfile.mktemp(suffix=".gif")
    try:
        r = subprocess.run(
            [helper_path(), "enc", path, str(w), str(h), str(len(pal))],
            input=pal.astype(np.uint8).tobytes() + idx.astype(np.uint8).tobytes(),
            capture_output=True, timeout=120,
        )
        if r.returncode != 0:
            raise RuntimeError(f"giflib enc failed rc={r.returncode}")
        return open(path, "rb").read()
    finally:
        if os.path.exists(path):
            os.unlink(path)
