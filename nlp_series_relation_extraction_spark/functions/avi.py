"""AVI (RIFF) container with an MJPEG video stream — the real-video path.

A web crawl's video payloads arrive in containers; the pipeline needs to
demux the container and sample frames without shipping every byte through
a codec. This module implements the AVI RIFF form (public spec: the
Microsoft "AVI RIFF File Reference" / OpenDML AVI 1.0, msdn riffmci) for
the Motion-JPEG case: every '00dc' chunk in the 'movi' list is a complete
baseline JFIF stream, decoded by functions/jpeg.py (whose output is pinned
bit-exact against libjpeg in tests/test_jpeg*.py — the codec layer is
externally validated; this module adds only container framing).

Layout written (and expected when reading):

    RIFF('AVI '
      LIST('hdrl'
        'avih' <MainAVIHeader: 14 DWORDs>
        LIST('strl'
          'strh' <AVIStreamHeader: fccType 'vids', handler 'MJPG'>
          'strf' <BITMAPINFOHEADER: biCompression 'MJPG'>))
      LIST('movi' '00dc' <jpeg> ...)
      'idx1' <AVIOLDINDEX entries>)

Reader tolerances, per the spec's own rules: chunks are WORD-aligned (an
odd-length chunk is followed by a pad byte that is NOT counted in its
size); unknown chunks/lists (JUNK, INFO, odd vendor chunks) are skipped;
'00db' (uncompressed-name, but used by MJPEG writers interchangeably) is
accepted alongside '00dc'; idx1 is optional (frames are recovered by the
movi walk, the index is only cross-checked when present).
"""

from __future__ import annotations

import struct

import numpy as np

AVIF_HASINDEX = 0x00000010


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) & 1 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_video_avi_mjpeg(
    frames: list["np.ndarray"], fps: int = 10, quality: int = 85
) -> bytes:
    """Encode HxWx3 uint8 RGB frames as an AVI/MJPEG file (with idx1)."""
    if not frames:
        raise ValueError("encode_video_avi_mjpeg: no frames")
    h, w = frames[0].shape[:2]
    from .jpeg import encode_image_jpeg

    jpegs = []
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share dimensions")
        jpegs.append(encode_image_jpeg(f, quality=quality))

    max_bytes = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,        # dwMicroSecPerFrame
        max_bytes * fps,         # dwMaxBytesPerSec
        0,                       # dwPaddingGranularity
        AVIF_HASINDEX,           # dwFlags
        len(jpegs),              # dwTotalFrames
        0,                       # dwInitialFrames
        1,                       # dwStreams
        max_bytes,               # dwSuggestedBufferSize
        w, h,                    # dwWidth, dwHeight
        0, 0, 0, 0,              # dwReserved[4]
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIIII",
            0, 0, 0,             # dwFlags, wPriority, wLanguage
            0,                   # dwInitialFrames
            1, fps,              # dwScale, dwRate  (rate/scale = fps)
            0, len(jpegs),       # dwStart, dwLength (in frames)
            max_bytes,           # dwSuggestedBufferSize
            0xFFFFFFFF,          # dwQuality (default)
            0,                   # dwSampleSize (0: variable-size frames)
            0,                   # rcFrame (left/top packed zero)
        )
        + struct.pack("<HH", w, h)  # rcFrame right/bottom
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                      # biSize
        w, h,                    # biWidth, biHeight
        1, 24,                   # biPlanes, biBitCount
        b"MJPG",                 # biCompression
        w * h * 3,               # biSizeImage (nominal)
        0, 0, 0, 0,              # biXPels, biYPels, biClrUsed, biClrImportant
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b""
    idx_entries = []
    for j in jpegs:
        # AVIOLDINDEX offsets point at the chunk FOURCC, counted from the
        # start of the 'movi' list type field (offset 4 = first chunk)
        idx_entries.append((4 + len(movi_payload), len(j)))
        movi_payload += _chunk(b"00dc", j)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<III", 0x10, off, ln)  # AVIIF_KEYFRAME
            for off, ln in idx_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk_chunks(data: bytes, pos: int, end: int):
    """Yield (fourcc, payload_start, payload_len); handles WORD alignment."""
    while pos + 8 <= end:
        fourcc = data[pos : pos + 4]
        ln = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        start = pos + 8
        if start + ln > end:
            raise ValueError(
                f"invalid AVI: chunk {fourcc!r} at {pos} overruns its parent"
            )
        yield fourcc, start, ln
        pos = start + ln + (ln & 1)


def decode_avi_mjpeg(
    data: bytes, frame_indices: list[int] | None = None
) -> tuple[list["np.ndarray"], int, dict]:
    """AVI/MJPEG -> (frames as HxWx3 uint8 RGB, fps, info).

    ``frame_indices`` selects which frames to DECODE (container demux
    still walks all chunk headers — that is header arithmetic, not codec
    work; this is what makes every-Nth sampling cheap). None = all.
    info carries {"width", "height", "n_frames", "handler"} from the
    headers, cross-checked against the movi walk and idx1 when present.
    """
    data = bytes(data)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    riff_len = struct.unpack("<I", data[4:8])[0]
    end = min(8 + riff_len, len(data))

    avih = None
    handler = None
    frames_raw: list[bytes] = []
    idx1_lens: list[int] | None = None

    def walk_list(pos: int, end: int) -> None:
        nonlocal avih, handler, idx1_lens
        for fourcc, start, ln in _walk_chunks(data, pos, end):
            payload_end = start + ln
            if fourcc == b"LIST":
                ltype = data[start : start + 4]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    if ltype == b"movi":
                        for fc, s, l in _walk_chunks(
                            data, start + 4, payload_end
                        ):
                            # ##dc/##db of stream 00; 'rec ' sub-lists legal
                            if fc in (b"00dc", b"00db"):
                                frames_raw.append(data[s : s + l])
                            elif fc == b"LIST" and data[s : s + 4] == b"rec ":
                                for fc2, s2, l2 in _walk_chunks(
                                    data, s + 4, s + l
                                ):
                                    if fc2 in (b"00dc", b"00db"):
                                        frames_raw.append(data[s2 : s2 + l2])
                    else:
                        walk_list(start + 4, payload_end)
            elif fourcc == b"avih":
                avih = struct.unpack("<14I", data[start : start + 56])
            elif fourcc == b"strh":
                if data[start : start + 4] == b"vids":
                    handler = data[start + 4 : start + 8].decode(
                        "ascii", "replace"
                    )
            elif fourcc == b"idx1":
                idx1_lens = [
                    struct.unpack("<I", data[start + 16 * i + 12 :
                                             start + 16 * i + 16])[0]
                    for i in range(ln // 16)
                ]

    walk_list(12, end)
    if avih is None:
        raise ValueError("invalid AVI: no avih header")
    if handler is not None and handler not in ("MJPG", "mjpg", "dmb1"):
        raise NotImplementedError(
            f"AVI video handler {handler!r} — MJPEG ('MJPG') decodes "
            "natively; plug ffmpeg/opencv here for inter-frame codecs"
        )
    usec_per_frame = avih[0]
    fps = round(1_000_000 / usec_per_frame) if usec_per_frame else 0
    info = {
        "width": avih[8],
        "height": avih[9],
        "n_frames": len(frames_raw),
        "handler": handler or "MJPG",
    }
    if avih[4] and avih[4] != len(frames_raw):
        raise ValueError(
            f"invalid AVI: avih says {avih[4]} frames, movi has "
            f"{len(frames_raw)}"
        )
    if idx1_lens is not None and [len(f) for f in frames_raw] != idx1_lens:
        raise ValueError("invalid AVI: idx1 entries disagree with movi")

    from .jpeg import decode_image_jpeg

    sel = (
        range(len(frames_raw))
        if frame_indices is None
        else [i for i in frame_indices if 0 <= i < len(frames_raw)]
    )
    return [decode_image_jpeg(frames_raw[i]) for i in sel], fps, info


def avi_frame_count(data: bytes) -> int:
    """Header-only frame count (no codec work) — the metadata-scan path."""
    return decode_avi_mjpeg(bytes(data), frame_indices=[])[2]["n_frames"]
