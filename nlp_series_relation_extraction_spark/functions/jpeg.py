"""Pure-numpy JPEG (JFIF) codec: baseline sequential AND progressive.

Scope is 8-bit JPEG, 1- or 3-component, any sampling factors up
to 2x2 (4:4:4, 4:2:2, 4:2:0): baseline (SOF0/1, restart markers
supported), PROGRESSIVE (SOF2 — spectral selection + successive
approximation: interleaved DC first/refinement scans, per-component AC
first/refinement scans with general EOBn end-of-band runs, coefficients
accumulated across scans and reconstructed once at EOI), and sequential
ARITHMETIC coding (SOF9 + DAC — QM coder and statistical models in
functions/jpeg_arith.py, decode and encode). Progressive-arithmetic
(SOF10), 12-bit, hierarchical, and restart markers inside progressive
scans remain out of scope and raise ``NotImplementedError`` with a
pointed message.

The encoders exist so tests exercise the decoder on genuine
self-produced streams (and so ``synthesize_media`` can emit mixed-codec
corpora): JFIF headers, libjpeg-style quality scaling of the Annex K
quantization tables, the Annex K Huffman tables, 2x2 box-filter chroma
subsampling, interleaved MCU scan with byte stuffing. The progressive
encoder emits a 2+2N-scan script (DC first Al=1, DC refine, per-comp AC
first Al=1, per-comp AC refine) over the same quantized coefficients as
the baseline encoder, so progressive decode must reproduce baseline
decode EXACTLY — the equality test that pins both sides.

Everything numeric is float64 matrix math (the DCT is an 8x8 orthonormal
basis product); only the entropy coding walks bits in Python — fine at
test scale, and at pipeline scale the decode runs inside Arrow-batched
``mapInPandas`` workers anyway (functions/multimodal.py).
"""

from __future__ import annotations

import numpy as np

# --- constants: zigzag, Annex K quantization + Huffman tables -----------------

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# ITU-T T.81 Annex K.1 (luminance) / K.2 (chrominance), zigzag order NOT
# applied (these are in natural row-major order)
QT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.float64,
)
QT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.float64,
)

# Annex K.3: (BITS counts per code length 1..16, HUFFVAL symbol list)
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_basis() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis T: DCT = T @ B @ T.T, IDCT = T.T @ C @ T."""
    T = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            T[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return T


_T = _dct_basis()


def _huffman_codes(spec) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical JPEG code assignment."""
    bits, values = spec
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huffman_decoder(bits, values) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex K tables."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = np.floor((base * scale + 50) / 100)
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


def _rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.float64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y, cb, cr) -> np.ndarray:
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(
        np.uint8
    )


def _pad_to(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    return np.pad(
        arr, ((0, h - arr.shape[0]), (0, w - arr.shape[1])), mode="edge"
    )


def _blocks(plane: np.ndarray) -> np.ndarray:
    """[n_by, n_bx, 8, 8] view of an 8-multiple plane."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).swapaxes(1, 2)


def _bit_size(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill to byte boundary

    def emit_marker(self, marker: int) -> None:
        """Byte-align and write a bare marker (RSTn) into the scan."""
        self.byte_align()
        self.out.append(0xFF)
        self.out.append(marker)

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def _encode_block(
    block: np.ndarray, qt: np.ndarray, dc_codes, ac_codes, pred: int,
    w: _BitWriter,
) -> int:
    coef = _T @ (block - 128.0) @ _T.T
    q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
    zz = q.reshape(-1)[ZIGZAG]
    # DC
    diff = int(zz[0]) - pred
    s = _bit_size(diff)
    code, length = dc_codes[s]
    w.write(code, length)
    if s:
        bits = diff if diff > 0 else diff + (1 << s) - 1
        w.write(bits, s)
    # AC
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            if k > last_nz:
                code, length = ac_codes[0x00]  # EOB
                w.write(code, length)
                break
            run += 1
            if run == 16:
                code, length = ac_codes[0xF0]  # ZRL
                w.write(code, length)
                run = 0
            continue
        s = _bit_size(v)
        code, length = ac_codes[(run << 4) | s]
        w.write(code, length)
        bits = v if v > 0 else v + (1 << s) - 1
        w.write(bits, s)
        run = 0
    return int(zz[0])



def _seg(marker: int, payload: bytes) -> bytes:
    """A marker segment with its big-endian length (shared by both
    encoders — the progressive==baseline equality pin depends on the
    header bytes coming from ONE implementation)."""
    return (
        bytes([0xFF, marker])
        + (len(payload) + 2).to_bytes(2, "big")
        + payload
    )


def _dqt_seg(tid: int, table: np.ndarray) -> bytes:
    zz = table.reshape(-1)[ZIGZAG].astype(np.uint8)
    return _seg(0xDB, bytes([tid]) + zz.tobytes())


def _dht_seg(cls: int, tid: int, spec) -> bytes:
    bits, values = spec
    return _seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values))


def encode_image_jpeg(
    arr: np.ndarray,
    quality: int = 85,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """Encode an HxWx3 uint8 RGB array as baseline JFIF JPEG.

    ``subsampling``: '444' (no chroma subsampling) or '420' (2x2 box).
    ``restart_interval`` > 0 emits a DRI segment and RSTn markers every
    that many MCUs (byte-aligned, DC predictors reset) — the feature real
    encoders use for error resilience/parallel decode; exercising it keeps
    the decoder's restart path honest."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    h, w = a.shape[:2]
    ycc = _rgb_to_ycbcr(a)
    qt_l, qt_c = _quality_tables(quality)
    hs, vs = (2, 2) if subsampling == "420" else (1, 1)
    mcu_h, mcu_w = 8 * vs, 8 * hs
    ph = -(-h // mcu_h) * mcu_h
    pw = -(-w // mcu_w) * mcu_w
    y = _pad_to(ycc[..., 0], ph, pw)
    cb = _pad_to(ycc[..., 1], ph, pw)
    cr = _pad_to(ycc[..., 2], ph, pw)
    if subsampling == "420":
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    yb, cbb, crb = _blocks(y), _blocks(cb), _blocks(cr)

    dc_l = _huffman_codes(DC_LUMA_SPEC)
    ac_l = _huffman_codes(AC_LUMA_SPEC)
    dc_c = _huffman_codes(DC_CHROMA_SPEC)
    ac_c = _huffman_codes(AC_CHROMA_SPEC)
    bw = _BitWriter()
    preds = [0, 0, 0]
    n_mcu_y = ph // mcu_h
    n_mcu_x = pw // mcu_w
    mcu = 0
    rst = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.emit_marker(0xD0 + rst)
                rst = (rst + 1) % 8
                preds = [0, 0, 0]
            mcu += 1
            for by in range(vs):
                for bx in range(hs):
                    preds[0] = _encode_block(
                        yb[my * vs + by, mx * hs + bx], qt_l, dc_l, ac_l,
                        preds[0], bw,
                    )
            preds[1] = _encode_block(cbb[my, mx], qt_c, dc_c, ac_c, preds[1], bw)
            preds[2] = _encode_block(crb[my, mx], qt_c, dc_c, ac_c, preds[2], bw)
    scan = bw.flush()

    seg, dqt, dht = _seg, _dqt_seg, _dht_seg

    sof = seg(
        0xC0,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])  # Y: sampling, qtable 0
        + bytes([2, 0x11, 1])  # Cb
        + bytes([3, 0x11, 1]),  # Cr
    )
    sos = seg(
        0xDA,
        bytes([3])
        + bytes([1, 0x00])  # Y: DC table 0, AC table 0
        + bytes([2, 0x11])  # Cb: DC 1, AC 1
        + bytes([3, 0x11])
        + bytes([0, 63, 0]),  # Ss, Se, Ah/Al (baseline full scan)
    )
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big"))
        if restart_interval
        else b""
    )
    return (
        b"\xff\xd8"
        + app0
        + dqt(0, qt_l)
        + dqt(1, qt_c)
        + dri
        + sof
        + dht(0, 0, DC_LUMA_SPEC)
        + dht(1, 0, AC_LUMA_SPEC)
        + dht(0, 1, DC_CHROMA_SPEC)
        + dht(1, 1, AC_CHROMA_SPEC)
        + sos
        + scan
        + b"\xff\xd9"
    )


# --- decoder -------------------------------------------------------------------


class _BitReader:
    """Bit reader over entropy-coded data with byte unstuffing; restart
    markers are handled by the caller via align_to_marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed literal FF
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartHit(nxt - 0xD0)
            else:
                raise _ScanEnd()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_bit(self) -> int:
        return self.read(1)

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _RestartHit(Exception):
    def __init__(self, n: int):
        self.n = n


class _ScanEnd(Exception):
    pass


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: huffman code longer than 16 bits")


def _decode_block(br, dc_tab, ac_tab, qt, pred: int):
    zz = np.zeros(64, dtype=np.float64)
    s = _decode_huff(br, dc_tab)
    diff = _extend(br.read(s), s) if s else 0
    dc = pred + diff
    zz[0] = dc
    k = 1
    while k < 64:
        rs = _decode_huff(br, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16  # ZRL
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("invalid JPEG: AC index overrun")
        zz[k] = _extend(br.read(s), s)
        k += 1
    coef = np.zeros(64, dtype=np.float64)
    # zz is zigzag-ordered; the natural-order quant value for zz[k] lives
    # at qt[ZIGZAG[k]]
    coef[ZIGZAG] = zz * qt[ZIGZAG]
    block = _T.T @ coef.reshape(8, 8) @ _T + 128.0
    return block, dc


def decode_image_jpeg(content: bytes) -> np.ndarray:
    """Baseline JFIF JPEG -> HxWx3 uint8 RGB (grayscale replicates to 3)."""
    data = bytes(content)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    arith_cond: dict = {}
    frame = None
    prog_state = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"invalid JPEG: expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        ln = int.from_bytes(data[pos + 2 : pos + 4], "big")
        payload = data[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(payload):
                prec, tid = payload[i] >> 4, payload[i] & 0x0F
                if prec:
                    raise NotImplementedError("16-bit JPEG quant tables")
                zz = np.frombuffer(
                    payload[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.float64)
                t = np.zeros(64, dtype=np.float64)
                t[ZIGZAG] = zz
                qtables[tid] = t
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(payload):
                cls, tid = payload[i] >> 4, payload[i] & 0x0F
                bits = list(payload[i + 1 : i + 17])
                n = sum(bits)
                values = list(payload[i + 17 : i + 17 + n])
                if len(bits) < 16 or len(values) < n:
                    raise ValueError("invalid JPEG: truncated DHT segment")
                htables[(cls, tid)] = _huffman_decoder(bits, values)
                i += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9):
            # SOF0/1 baseline, SOF2 progressive, SOF9 sequential arithmetic
            if len(payload) < 6 or len(payload) < 6 + 3 * payload[5]:
                raise ValueError("invalid JPEG: truncated SOF segment")
            precision = payload[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            fh = int.from_bytes(payload[1:3], "big")
            fw = int.from_bytes(payload[3:5], "big")
            nc = payload[5]
            comps = []
            for c in range(nc):
                cid = payload[6 + 3 * c]
                hv = payload[7 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F,
                     "qt": payload[8 + 3 * c]}
                )
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "progressive": marker == 0xC2,
                "arith": marker == 0xC9,
            }
            if marker == 0xC2:
                prog_state = _prog_init(frame)
        elif marker == 0xCC:  # DAC: arithmetic conditioning
            i = 0
            while i + 1 < len(payload):
                tc, tb = payload[i] >> 4, payload[i] & 0x0F
                cs = payload[i + 1]
                if tc == 0:
                    arith_cond[("dc", tb)] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    arith_cond[("ac", tb)] = cs  # Kx
                i += 2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline (SOF0/1), progressive Huffman (SOF2) and "
                "sequential arithmetic (SOF9) JPEG are supported, got SOF "
                f"marker 0x{marker:02X} (progressive-arithmetic/lossless/"
                "hierarchical)"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(payload[:2], "big")
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            if len(payload) < 1 or len(payload) < 4 + 2 * payload[0]:
                raise ValueError("invalid JPEG: truncated SOS header")
            ns = payload[0]
            scan_comps = []
            for c in range(ns):
                cid = payload[1 + 2 * c]
                tt = payload[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tt >> 4, "ac": tt & 0x0F}
                )
            if frame.get("progressive"):
                if restart_interval:
                    raise NotImplementedError(
                        "restart markers inside progressive scans"
                    )
                ss = payload[1 + 2 * ns]
                se = payload[2 + 2 * ns]
                ahal = payload[3 + 2 * ns]
                pos = _decode_prog_scan(
                    data, pos + 2 + ln, frame, scan_comps, htables,
                    prog_state, ss, se, ahal >> 4, ahal & 0x0F,
                )
                continue
            if frame.get("arith"):
                from .jpeg_arith import decode_arith_scan

                planes = decode_arith_scan(
                    data, pos + 2 + ln, frame, scan_comps, qtables,
                    restart_interval, arith_cond,
                )
                hmax = max(c["h"] for c in scan_comps)
                vmax = max(c["v"] for c in scan_comps)
                return _planes_to_image(
                    frame, scan_comps, planes, hmax, vmax
                )
            try:
                return _decode_scan(
                    data, pos + 2 + ln, frame, scan_comps, qtables,
                    htables, restart_interval,
                )
            except IndexError as exc:  # truncated entropy-coded data
                raise ValueError("invalid JPEG: truncated scan") from exc
        pos += 2 + ln
    if frame is not None and frame.get("progressive"):
        return _prog_reconstruct(frame, prog_state, qtables)
    raise ValueError("invalid JPEG: no scan data")


def _decode_scan(
    data, pos, frame, comps, qtables, htables, restart_interval
) -> np.ndarray:
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fh, fw = frame["h"], frame["w"]
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    n_mcu_x = -(-fw // mcu_w)
    n_mcu_y = -(-fh // mcu_h)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((n_mcu_y * c["v"] * 8, n_mcu_x * c["h"] * 8), np.float64)
        )
    preds = [0] * len(comps)
    br = _BitReader(data, pos)
    mcu = 0
    expect_rst = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # the encoder emits RSTn between intervals; consume it
                br.byte_align()
                try:
                    while True:
                        br._fill()
                except _RestartHit as r:
                    if r.n != expect_rst:
                        raise ValueError(
                            f"invalid JPEG: RST{r.n}, expected RST{expect_rst}"
                        ) from None
                    br.pos += 2
                    br.byte_align()
                    expect_rst = (expect_rst + 1) % 8
                    preds = [0] * len(comps)
                except _ScanEnd:
                    raise ValueError("invalid JPEG: truncated scan") from None
            for ci, c in enumerate(comps):
                qt = qtables[c["qt"]]
                dc_tab = htables[(0, c["dc"])]
                ac_tab = htables[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block, preds[ci] = _decode_block(
                            br, dc_tab, ac_tab, qt, preds[ci]
                        )
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
    return _planes_to_image(frame, comps, planes, hmax, vmax)


def _planes_to_image(frame, comps, planes, hmax, vmax) -> np.ndarray:
    """Upsample each component plane to full MCU-grid resolution, crop
    to frame dims, convert to RGB (shared by the Huffman and arithmetic
    sequential paths)."""
    fh, fw = frame["h"], frame["w"]
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise NotImplementedError(f"{len(full)}-component JPEG")


# --- progressive (SOF2) ------------------------------------------------------


def _comp_coef_arrays(arr: np.ndarray, quality: int, subsampling: str):
    """Quantized zigzag coefficient arrays per component, [bh, bw, 64]
    int64 over the MCU-padded grid — the same coefficients the baseline
    encoder would write, computed vectorized."""
    a = np.asarray(arr, dtype=np.uint8)
    h, w = a.shape[:2]
    ycc = _rgb_to_ycbcr(a)
    qt_l, qt_c = _quality_tables(quality)
    hs, vs = (2, 2) if subsampling == "420" else (1, 1)
    mcu_h, mcu_w = 8 * vs, 8 * hs
    ph = -(-h // mcu_h) * mcu_h
    pw = -(-w // mcu_w) * mcu_w
    y = _pad_to(ycc[..., 0], ph, pw)
    cb = _pad_to(ycc[..., 1], ph, pw)
    cr = _pad_to(ycc[..., 2], ph, pw)
    if subsampling == "420":
        cb = cb.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cr = cr.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
    out = []
    for plane, qt in ((y, qt_l), (cb, qt_c), (cr, qt_c)):
        B = _blocks(plane) - 128.0  # [bh, bw, 8, 8]
        coef = np.einsum("ab,ijbc,cd->ijad", _T, B, _T.T)
        q = np.round(coef / qt.reshape(8, 8)).astype(np.int64)
        out.append(q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG])
    return out, (h, w, hs, vs, qt_l, qt_c)


def _pt_ac(v: int, al: int) -> int:
    """AC point transform: divide by 2^Al rounding TOWARD ZERO (T.81
    G.1.2.2); DC uses plain arithmetic shift instead."""
    return -((-v) >> al) if v < 0 else v >> al


def _enc_dc_scan(zz_list, hs, vs, n_mcu_x, n_mcu_y, al, refine, bw):
    """Interleaved DC scan over the full MCU grid. First scan (refine
    False): Huffman-coded diffs of dc >> al. Refinement: one raw bit."""
    dc_l = _huffman_codes(DC_LUMA_SPEC)
    dc_c = _huffman_codes(DC_CHROMA_SPEC)
    samp = [(hs, vs), (1, 1), (1, 1)]
    preds = [0, 0, 0]
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            for ci, zz in enumerate(zz_list):
                ch, cv = samp[ci]
                codes = dc_l if ci == 0 else dc_c
                for by in range(cv):
                    for bx in range(ch):
                        d = int(zz[my * cv + by, mx * ch + bx, 0])
                        if refine:
                            bw.write((d >> al) & 1, 1)
                            continue
                        v = d >> al  # DC: arithmetic shift (G.1.2.1)
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _bit_size(diff)
                        code, length = codes[s]
                        bw.write(code, length)
                        if s:
                            bw.write(
                                diff if diff > 0 else diff + (1 << s) - 1, s
                            )


def _enc_ac_first(zz, bw_c, bh_c, al, ac_codes, bw):
    """Non-interleaved AC first scan, band 1..63. EOBs are emitted as
    EOB0 per block (run length 1) so the Annex K sequential AC tables —
    which lack the EOBn symbols 0x10..0xE0 — stay sufficient; the decoder
    handles general EOBn from other encoders."""
    for byi in range(bh_c):
        for bxi in range(bw_c):
            band = [_pt_ac(int(v), al) for v in zz[byi, bxi, 1:64]]
            nz = [k for k, v in enumerate(band) if v]
            if not nz:
                code, length = ac_codes[0x00]
                bw.write(code, length)
                continue
            last = nz[-1]
            run = 0
            for k, v in enumerate(band):
                if k > last:
                    break
                if v == 0:
                    run += 1
                    if run == 16:
                        code, length = ac_codes[0xF0]
                        bw.write(code, length)
                        run = 0
                    continue
                s = _bit_size(v)
                code, length = ac_codes[(run << 4) | s]
                bw.write(code, length)
                bw.write(v if v > 0 else v + (1 << s) - 1, s)
                run = 0
            if last < 62:  # trailing zeros -> end-of-band
                code, length = ac_codes[0x00]
                bw.write(code, length)


def _enc_ac_refine(zz, bw_c, bh_c, ah, al, ac_codes, bw):
    """Non-interleaved AC refinement scan (T.81 G.1.2.3): correction bits
    for history-nonzero coefficients, (run, 1)+sign for newly-nonzero
    ones, EOB0 + trailing corrections per block."""
    for byi in range(bh_c):
        for bxi in range(bw_c):
            band = [int(v) for v in zz[byi, bxi, 1:64]]
            hist = [_pt_ac(v, ah) for v in band]  # what earlier scans sent
            cur = [_pt_ac(v, al) for v in band]
            run = 0
            pending: list[int] = []
            for k in range(63):
                if hist[k] != 0:
                    pending.append(abs(cur[k]) & 1)
                    continue
                if cur[k] == 0:
                    run += 1
                    if run == 16:
                        # ZRL: 16 zero-history zeros skipped; corrections
                        # for nonzero-history coefficients passed ride
                        # along after the symbol
                        code, length = ac_codes[0xF0]
                        bw.write(code, length)
                        for b in pending:
                            bw.write(b, 1)
                        pending = []
                        run = 0
                    continue
                # newly nonzero: magnitude must be exactly 1 at this scan
                code, length = ac_codes[(run << 4) | 1]
                bw.write(code, length)
                bw.write(1 if cur[k] > 0 else 0, 1)  # sign bit
                for b in pending:
                    bw.write(b, 1)
                pending = []
                run = 0
            if run > 0 or pending:
                # block ends before Se with zero-history zeros and/or
                # unsent corrections -> EOB0 then the corrections
                code, length = ac_codes[0x00]
                bw.write(code, length)
                for b in pending:
                    bw.write(b, 1)


def encode_image_jpeg_progressive(
    arr: np.ndarray, quality: int = 85, subsampling: str = "420"
) -> bytes:
    """HxWx3 uint8 RGB -> progressive (SOF2) JFIF JPEG.

    Scan script: interleaved DC first (Al=1), interleaved DC refinement,
    then per component AC first (Ss=1..63, Al=1) and AC refinement
    (Ah=1, Al=0). Same quantized coefficients as the baseline encoder at
    the same (quality, subsampling), so both decode to identical pixels.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"expected HxWx3 uint8, got shape {a.shape}")
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    zz_list, (h, w, hs, vs, qt_l, qt_c) = _comp_coef_arrays(
        a, quality, subsampling
    )
    n_mcu_x = -(-w // (8 * hs))
    n_mcu_y = -(-h // (8 * vs))
    ac_l = _huffman_codes(AC_LUMA_SPEC)
    ac_c = _huffman_codes(AC_CHROMA_SPEC)
    samp = [(hs, vs), (1, 1), (1, 1)]

    seg, dqt, dht = _seg, _dqt_seg, _dht_seg

    def sos(comps: list[tuple[int, int, int]], ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for cid, dc_t, ac_t in comps:
            body += bytes([cid, (dc_t << 4) | ac_t])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    out = bytearray()
    out += b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, qt_l) + dqt(1, qt_c)
    out += seg(
        0xC2,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    out += dht(0, 0, DC_LUMA_SPEC) + dht(0, 1, DC_CHROMA_SPEC)
    out += dht(1, 0, AC_LUMA_SPEC) + dht(1, 1, AC_CHROMA_SPEC)

    # scan 1: DC first, interleaved, Al=1
    bw = _BitWriter()
    _enc_dc_scan(zz_list, hs, vs, n_mcu_x, n_mcu_y, 1, False, bw)
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 0, 1) + bw.flush()
    # scan 2: DC refinement to full precision (Ah=1, Al=0; no Huffman)
    bw = _BitWriter()
    _enc_dc_scan(zz_list, hs, vs, n_mcu_x, n_mcu_y, 0, True, bw)
    out += sos([(1, 0, 0), (2, 1, 0), (3, 1, 0)], 0, 0, 1, 0) + bw.flush()
    # per-component AC scans over the COMPONENT block grid (ceil of the
    # scaled sample dims — NOT the MCU grid; padding blocks are DC-only,
    # exactly like libjpeg emits)
    for ci, zz in enumerate(zz_list):
        ch, cv = samp[ci]
        cw = -(-(w * ch) // hs)
        chh = -(-(h * cv) // vs)
        bw_c, bh_c = -(-cw // 8), -(-chh // 8)
        ac_codes = ac_l if ci == 0 else ac_c
        ac_t = 0 if ci == 0 else 1
        cid = ci + 1
        b = _BitWriter()
        _enc_ac_first(zz, bw_c, bh_c, 1, ac_codes, b)
        out += sos([(cid, 0, ac_t)], 1, 63, 0, 1) + b.flush()
        b = _BitWriter()
        _enc_ac_refine(zz, bw_c, bh_c, 1, 0, ac_codes, b)
        out += sos([(cid, 0, ac_t)], 1, 63, 1, 0) + b.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive decode ------------------------------------------------------


def _prog_init(frame) -> dict:
    """Per-component integer coefficient accumulators over the MCU grid
    (zigzag order), plus per-scan EOB-run state."""
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    n_mcu_x = -(-frame["w"] // (8 * hmax))
    n_mcu_y = -(-frame["h"] // (8 * vmax))
    coef = {}
    for c in frame["comps"]:
        coef[c["id"]] = np.zeros(
            (n_mcu_y * c["v"], n_mcu_x * c["h"], 64), dtype=np.int64
        )
    return {
        "coef": coef,
        "hmax": hmax,
        "vmax": vmax,
        "n_mcu_x": n_mcu_x,
        "n_mcu_y": n_mcu_y,
    }


def _comp_block_dims(frame, comp, hmax, vmax) -> tuple[int, int]:
    """Non-interleaved scan geometry (T.81 A.2.2): blocks cover the
    component's OWN sample grid, ceil'd to 8 — not the MCU grid."""
    cw = -(-(frame["w"] * comp["h"]) // hmax)
    ch = -(-(frame["h"] * comp["v"]) // vmax)
    return -(-cw // 8), -(-ch // 8)


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First non-stuffed marker at/after pos (skips FF fill bytes)."""
    n = len(data)
    while pos < n - 1:
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            return pos
        pos += 1
    return n


def _refine_one(br: _BitReader, band: np.ndarray, k: int, al: int) -> None:
    """Correction bit for an already-nonzero coefficient (G.2)."""
    if br.read(1):
        band[k] += (1 << al) if band[k] > 0 else -(1 << al)


def _decode_prog_scan(
    data, pos, frame, comps, htables, state, ss, se, ah, al
) -> int:
    """One progressive scan into the coefficient accumulators; returns the
    position of the next marker after the entropy-coded data."""
    br = _BitReader(data, pos)
    coef = state["coef"]
    try:
        if ss == 0:  # DC scan (must be Se == 0)
            if se != 0:
                raise ValueError("invalid JPEG: DC scan with Se != 0")
            preds = {c["id"]: 0 for c in comps}
            if len(comps) > 1:  # interleaved over the full MCU grid
                order = []
                for my in range(state["n_mcu_y"]):
                    for mx in range(state["n_mcu_x"]):
                        for c in comps:
                            for by in range(c["v"]):
                                for bx in range(c["h"]):
                                    order.append(
                                        (c, my * c["v"] + by,
                                         mx * c["h"] + bx)
                                    )
            else:
                c = comps[0]
                bw_c, bh_c = _comp_block_dims(
                    frame, c, state["hmax"], state["vmax"]
                )
                order = [
                    (c, byi, bxi)
                    for byi in range(bh_c)
                    for bxi in range(bw_c)
                ]
            for c, byi, bxi in order:
                band = coef[c["id"]][byi, bxi]
                if ah == 0:  # first DC scan: Huffman diffs at Al precision
                    s = _decode_huff(br, htables[(0, c["dc"])])
                    diff = _extend(br.read(s), s) if s else 0
                    preds[c["id"]] += diff
                    band[0] = preds[c["id"]] << al
                else:  # refinement: one raw bit
                    band[0] |= br.read(1) << al
        else:  # AC scan: exactly one component (T.81 B.2.3)
            if len(comps) != 1:
                raise ValueError("invalid JPEG: interleaved AC scan")
            c = comps[0]
            ac_tab = htables[(1, c["ac"])]
            bw_c, bh_c = _comp_block_dims(
                frame, c, state["hmax"], state["vmax"]
            )
            eobrun = 0
            for byi in range(bh_c):
                for bxi in range(bw_c):
                    band = coef[c["id"]][byi, bxi]
                    if ah == 0:  # ---- AC first scan
                        if eobrun:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = _decode_huff(br, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r < 15:  # EOBn
                                    eobrun = (1 << r) - 1
                                    if r:
                                        eobrun += br.read(r)
                                    break
                                k += 16  # ZRL
                                continue
                            k += r
                            if k > se:
                                raise ValueError(
                                    "invalid JPEG: AC index overrun"
                                )
                            band[k] = _extend(br.read(s), s) << al
                            k += 1
                    else:  # ---- AC refinement scan (G.2)
                        if eobrun:
                            for k in range(ss, se + 1):
                                if band[k]:
                                    _refine_one(br, band, k, al)
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = _decode_huff(br, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0 and r < 15:  # EOBn: refine remainder
                                eobrun = (1 << r) - 1
                                if r:
                                    eobrun += br.read(r)
                                while k <= se:
                                    if band[k]:
                                        _refine_one(br, band, k, al)
                                    k += 1
                                break
                            if s == 0:  # ZRL: pass 16 zero-history coeffs
                                zeros = 0
                                while k <= se and zeros < 16:
                                    if band[k]:
                                        _refine_one(br, band, k, al)
                                    else:
                                        zeros += 1
                                    k += 1
                                continue
                            if s != 1:
                                raise ValueError(
                                    "invalid JPEG: refinement magnitude "
                                    f"{s} != 1"
                                )
                            newv = (1 << al) if br.read(1) else -(1 << al)
                            zeros_needed = r
                            while k <= se:
                                if band[k]:
                                    _refine_one(br, band, k, al)
                                    k += 1
                                elif zeros_needed:
                                    zeros_needed -= 1
                                    k += 1
                                else:
                                    break
                            if k > se:
                                raise ValueError(
                                    "invalid JPEG: refinement overrun"
                                )
                            band[k] = newv
                            k += 1
    except (_RestartHit, _ScanEnd, IndexError) as exc:
        # IndexError = _BitReader ran off the end of a truncated payload;
        # keep the decoder's ValueError contract so corrupt corpus
        # payloads hit extract_features' fallback, not a task failure
        raise ValueError(
            "invalid JPEG: truncated/restart-marked progressive scan"
        ) from exc
    return _next_marker_pos(data, br.pos)


def _prog_reconstruct(frame, state, qtables) -> np.ndarray:
    """Dequantize + IDCT every accumulated block, assemble planes,
    upsample, color-convert — identical math to the baseline path."""
    full = []
    fh, fw = frame["h"], frame["w"]
    for c in frame["comps"]:
        zz = state["coef"][c["id"]].astype(np.float64)
        qt = qtables[c["qt"]]
        nat = np.zeros_like(zz)
        nat[:, :, ZIGZAG] = zz * qt[ZIGZAG]
        B = nat.reshape(zz.shape[0], zz.shape[1], 8, 8)
        px = np.einsum("ab,ijbc,cd->ijad", _T.T, B, _T) + 128.0
        plane = px.swapaxes(1, 2).reshape(zz.shape[0] * 8, zz.shape[1] * 8)
        ry = state["vmax"] // c["v"]
        rx = state["hmax"] // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        g = np.clip(full[0].round(), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    if len(full) == 3:
        return _ycbcr_to_rgb(full[0], full[1], full[2])
    raise NotImplementedError(f"{len(full)}-component JPEG")
