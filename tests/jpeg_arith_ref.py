"""Reference harness for arithmetic-coded JPEG: compiles a tiny C helper
against the system libjpeg (which ships the arithmetic codec) and uses
it to (a) produce arithmetic/Huffman twin encodings of the same pixels
and (b) decode any JPEG with libjpeg. Import-guarded: tests skip when
gcc or jpeglib.h is unavailable. Public libjpeg API only."""

from __future__ import annotations

import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <jpeglib.h>

/* modes:
 *   enc <w> <h> <quality> <arith 0|1> <gray 0|1> <h_samp> <v_samp> <rst>
 *       stdin: raw RGB (or gray) rows; stdout: JPEG
 *   dec  stdin: JPEG; stdout: "w h ncomp\n" then raw interleaved bytes
 */

static int do_enc(int w, int h, int q, int arith, int gray,
                  int hs, int vs, int rst) {
  struct jpeg_compress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned long outsize = 0;
  unsigned char *outbuf = NULL;
  int row_stride = gray ? w : w * 3;
  unsigned char *raster = malloc((size_t)row_stride * h);
  if (fread(raster, 1, (size_t)row_stride * h, stdin) !=
      (size_t)row_stride * h)
    return 2;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &outbuf, &outsize);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = gray ? 1 : 3;
  cinfo.in_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, q, TRUE);
  cinfo.arith_code = arith ? TRUE : FALSE;
  cinfo.optimize_coding = FALSE;
  if (!gray) {
    cinfo.comp_info[0].h_samp_factor = hs;
    cinfo.comp_info[0].v_samp_factor = vs;
    cinfo.comp_info[1].h_samp_factor = 1;
    cinfo.comp_info[1].v_samp_factor = 1;
    cinfo.comp_info[2].h_samp_factor = 1;
    cinfo.comp_info[2].v_samp_factor = 1;
  }
  cinfo.restart_interval = rst;
  jpeg_start_compress(&cinfo, TRUE);
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = raster + (size_t)cinfo.next_scanline * row_stride;
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);
  fwrite(outbuf, 1, outsize, stdout);
  free(outbuf);
  free(raster);
  return 0;
}

static int do_dec(void) {
  struct jpeg_decompress_struct cinfo;
  struct jpeg_error_mgr jerr;
  unsigned char *inbuf = NULL;
  size_t insize = 0, cap = 1 << 20;
  inbuf = malloc(cap);
  for (;;) {
    size_t n = fread(inbuf + insize, 1, cap - insize, stdin);
    insize += n;
    if (n == 0) break;
    if (insize == cap) { cap <<= 1; inbuf = realloc(inbuf, cap); }
  }
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, inbuf, insize);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);
  int stride = cinfo.output_width * cinfo.output_components;
  unsigned char *row = malloc(stride);
  printf("%d %d %d\n", cinfo.output_width, cinfo.output_height,
         cinfo.output_components);
  fflush(stdout);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW r = row;
    jpeg_read_scanlines(&cinfo, &r, 1);
    fwrite(row, 1, stride, stdout);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  free(row); free(inbuf);
  return 0;
}

int main(int argc, char **argv) {
  if (argc >= 2 && strcmp(argv[1], "dec") == 0) return do_dec();
  if (argc == 10 && strcmp(argv[1], "enc") == 0)
    return do_enc(atoi(argv[2]), atoi(argv[3]), atoi(argv[4]),
                  atoi(argv[5]), atoi(argv[6]), atoi(argv[7]),
                  atoi(argv[8]), atoi(argv[9]));
  return 64;
}
"""

_HELPER = None


def helper_path():
    """Compile (once) and return the helper binary path, or None."""
    global _HELPER
    if _HELPER is not None:
        return _HELPER or None
    _HELPER = False
    try:
        d = tempfile.mkdtemp(prefix="jparith")
        src = os.path.join(d, "helper.c")
        binp = os.path.join(d, "helper")
        with open(src, "w") as f:
            f.write(_C_SRC)
        r = subprocess.run(
            ["gcc", "-O2", "-o", binp, src, "-ljpeg"],
            capture_output=True, timeout=120,
        )
        if r.returncode == 0:
            _HELPER = binp
    except (OSError, subprocess.SubprocessError):
        pass
    return _HELPER or None


def available() -> bool:
    return helper_path() is not None


def encode(arr: np.ndarray, quality: int = 85, arith: bool = True,
           h_samp: int = 2, v_samp: int = 2, restart: int = 0) -> bytes:
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    r = subprocess.run(
        [helper_path(), "enc", str(w), str(h), str(quality),
         "1" if arith else "0", "1" if gray else "0",
         str(h_samp), str(v_samp), str(restart)],
        input=np.ascontiguousarray(arr).tobytes(),
        capture_output=True, timeout=120,
    )
    if r.returncode != 0 or not r.stdout:
        raise RuntimeError(f"helper enc failed rc={r.returncode}")
    return r.stdout


def decode(data: bytes) -> np.ndarray:
    r = subprocess.run(
        [helper_path(), "dec"], input=data, capture_output=True, timeout=120
    )
    if r.returncode != 0:
        raise RuntimeError(f"helper dec failed rc={r.returncode}")
    head, _, raw = r.stdout.partition(b"\n")
    w, h, nc = (int(x) for x in head.split())
    arr = np.frombuffer(raw, dtype=np.uint8, count=w * h * nc).reshape(h, w, nc)
    if nc == 1:
        arr = np.repeat(arr, 3, axis=2)
    return arr.copy()
