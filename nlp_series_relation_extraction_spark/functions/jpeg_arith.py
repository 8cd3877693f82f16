"""Arithmetic-coded JPEG (SOF9, sequential DCT) entropy decoder.

Implements ITU-T T.81 Annex D's QM arithmetic decoder (state machine of
Table D.3 — normative spec data, validated against the system libjpeg's
exported copy in tests) plus the Annex F statistical models for DC
(F.2.4.1: sign / magnitude-category / mantissa trees conditioned on the
previous diff class via the DAC L/U bounds) and AC coefficients
(F.2.4.2: per-index EOB decision, the fixed ~0.5 sign state, and the
low/high magnitude regions split at the DAC Kx index). The register
formulation follows the spec's renormalization-with-byte-feeding
discipline (D.2.6): markers terminate the data segment and zero bytes
are fed from then on, FF00 unstuffs to an FF data byte.

Conformance pin (tests/test_jpeg_arith.py): a libjpeg arithmetic stream
and its Huffman twin (same pixels, same quality) must decode through
THIS package to byte-identical images — the entropy layers recover
identical quantized coefficients, and everything downstream (dequant,
IDCT, upsample, color convert) is shared with functions/jpeg.py.

Reference behavior: zhoujx4/NLP-Series-relation-extraction has no image
path; this closes the arithmetic-JPEG item of the codec-residue list.
"""

from __future__ import annotations

import numpy as np

# T.81 Table D.3: (Qe, next-index after LPS, next-index after MPS,
# switch-MPS). Index 113 is the non-adapting ~0.5 state used for AC
# signs. Verified byte-for-byte against libjpeg's jpeg_aritab in tests.
QE_TABLE = (
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1), (0x5A1D, 113, 113, 0),
)

_QE = tuple(r[0] for r in QE_TABLE)
_NLPS = tuple(r[1] for r in QE_TABLE)
_NMPS = tuple(r[2] for r in QE_TABLE)
_SWITCH = tuple(r[3] for r in QE_TABLE)


class ArithDecoder:
    """T.81 Annex D QM decoder over one entropy-coded data segment.
    Statistics bins are bytearrays of state values (mps << 7 | index)."""

    __slots__ = ("data", "pos", "c", "a", "ct", "marker_pos")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.c = 0
        self.a = 0
        self.ct = -16  # force loading two initial bytes (D.2.7 INITDEC)
        self.marker_pos = -1  # where the terminating marker's FF sits

    def _feed(self) -> int:
        """Next data byte per D.2.6: FF00 unstuffs to FF; FF+marker ends
        the segment (zero bytes are fed from then on, position of the
        marker recorded for the restart logic)."""
        if self.marker_pos >= 0:
            return 0
        d = self.data
        if self.pos >= len(d):
            self.marker_pos = len(d)
            return 0
        b = d[self.pos]
        if b != 0xFF:
            self.pos += 1
            return b
        ff_at = self.pos
        j = self.pos + 1
        while j < len(d) and d[j] == 0xFF:
            j += 1
        if j < len(d) and d[j] == 0x00:
            self.pos = j + 1
            return 0xFF
        self.marker_pos = ff_at
        return 0

    def decode(self, stats: bytearray, i: int) -> int:
        # renormalize + byte feeding (lazy, self-initializing)
        a = self.a
        while a < 0x8000:
            self.ct -= 1
            if self.ct < 0:
                self.c = (self.c << 8) | self._feed()
                self.ct += 8
                if self.ct < 0:
                    self.ct += 1
                    if self.ct == 0:
                        a = 0x8000  # two initial bytes loaded
            a <<= 1
        sv = stats[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe = _QE[idx]
        a -= qe
        bound = a << self.ct
        if self.c >= bound:
            self.c -= bound
            # LPS subinterval; conditional exchange when it is the bigger
            if a < qe:
                d = mps
                stats[i] = (mps << 7) | _NMPS[idx]
            else:
                d = 1 - mps
                stats[i] = ((mps ^ _SWITCH[idx]) << 7) | _NLPS[idx]
            a = qe
        elif a < 0x8000:
            # MPS subinterval needing renormalization
            if a < qe:
                d = 1 - mps
                stats[i] = ((mps ^ _SWITCH[idx]) << 7) | _NLPS[idx]
            else:
                d = mps
                stats[i] = (mps << 7) | _NMPS[idx]
        else:
            d = mps
        self.a = a
        return d


_FIXED = bytearray([113])  # the non-adapting ~0.5 state (AC signs)


def _decode_dc(dec, st, ctx, L, U):
    """F.2.4.1 DC diff decode -> (diff, next conditioning context)."""
    if dec.decode(st, ctx) == 0:
        return 0, 0
    sign = dec.decode(st, ctx + 1)
    s = ctx + 2 + sign
    m = dec.decode(st, s)
    if m:
        s = 20  # magnitude-category extension bins (Table F.4 X1)
        while dec.decode(st, s):
            m <<= 1
            if m == 0x8000:
                raise ValueError("invalid arithmetic JPEG: DC magnitude")
            s += 1
    if m < (1 << L) >> 1:
        nctx = 0
    elif m > (1 << U) >> 1:
        nctx = 12 + sign * 4
    else:
        nctx = 4 + sign * 4
    v = m
    s += 14  # mantissa bins follow their category bins
    while m > 1:
        m >>= 1
        if dec.decode(st, s):
            v |= m
    v += 1
    return (-v if sign else v), nctx


def _decode_ac_block(dec, st, kx, out_zz):
    """F.2.4.2 AC decode for one block into out_zz[1..63] (zigzag)."""
    k = 1
    while k <= 63:
        s = 3 * (k - 1)
        if dec.decode(st, s):  # EOB
            return
        while dec.decode(st, s + 1) == 0:
            s += 3
            k += 1
            if k > 63:
                raise ValueError("invalid arithmetic JPEG: AC run off end")
        sign = dec.decode(_FIXED, 0)
        s += 2
        m = dec.decode(st, s)
        if m:
            if dec.decode(st, s):
                m = 2
                s = 189 if k <= kx else 217  # high-magnitude bins
                while dec.decode(st, s):
                    m <<= 1
                    if m == 0x8000:
                        raise ValueError(
                            "invalid arithmetic JPEG: AC magnitude"
                        )
                    s += 1
        v = m
        s += 14
        while m > 1:
            m >>= 1
            if dec.decode(st, s):
                v |= m
        v += 1
        out_zz[k] = -v if sign else v
        k += 1


def decode_arith_scan(
    data, pos, frame, comps, qtables, restart_interval, conditioning
):
    """Sequential arithmetic scan -> list of per-component planes (the
    caller shares the upsample/convert tail with the Huffman path).

    ``conditioning`` is the DAC state: {("dc", tbl): (L, U),
    ("ac", tbl): Kx} with the T.81 defaults L=0, U=1, Kx=5 when a table
    was never named by a DAC segment."""
    from .jpeg import ZIGZAG, _T

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    fh, fw = frame["h"], frame["w"]
    n_mcu_x = -(-fw // (8 * hmax))
    n_mcu_y = -(-fh // (8 * vmax))
    planes = [
        np.zeros((n_mcu_y * c["v"] * 8, n_mcu_x * c["h"] * 8), np.float64)
        for c in comps
    ]

    def fresh_state():
        dc_stats = {}
        ac_stats = {}
        for c in comps:
            dc_stats.setdefault(c["dc"], bytearray(64))
            ac_stats.setdefault(c["ac"], bytearray(256))
        return dc_stats, ac_stats, [0] * len(comps), [0] * len(comps)

    dc_stats, ac_stats, dc_ctx, last_dc = fresh_state()
    dec = ArithDecoder(data, pos)
    zz = np.zeros(64, dtype=np.float64)
    mcu = 0
    expect_rst = 0
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                # the decoder stalls at the marker; verify it is the
                # expected RSTn and restart a fresh segment after it
                if dec.marker_pos < 0:
                    # statistically possible: decoding finished without
                    # consuming up to the marker — find it from pos
                    j = dec.pos
                    while j + 1 < len(data) and not (
                        data[j] == 0xFF and data[j + 1] != 0x00
                    ):
                        j += 1
                    dec.marker_pos = j
                mpos = dec.marker_pos
                if (
                    mpos + 1 >= len(data)
                    or data[mpos] != 0xFF
                    or not 0xD0 <= data[mpos + 1] <= 0xD7
                ):
                    raise ValueError(
                        "invalid arithmetic JPEG: expected restart marker"
                    )
                if data[mpos + 1] - 0xD0 != expect_rst:
                    raise ValueError(
                        f"invalid arithmetic JPEG: RST{data[mpos+1]-0xD0}, "
                        f"expected RST{expect_rst}"
                    )
                expect_rst = (expect_rst + 1) % 8
                dc_stats, ac_stats, dc_ctx, last_dc = fresh_state()
                dec = ArithDecoder(data, mpos + 2)
            for ci, c in enumerate(comps):
                qt = qtables[c["qt"]]
                L, U = conditioning.get(("dc", c["dc"]), (0, 1))
                kx = conditioning.get(("ac", c["ac"]), 5)
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz[:] = 0.0
                        diff, dc_ctx[ci] = _decode_dc(
                            dec, dc_stats[c["dc"]], dc_ctx[ci], L, U
                        )
                        last_dc[ci] += diff
                        zz[0] = last_dc[ci]
                        _decode_ac_block(dec, ac_stats[c["ac"]], kx, zz)
                        # dequant + IDCT EXACTLY as the Huffman path
                        # (jpeg.py _decode_block) so arithmetic/Huffman
                        # twins reconstruct byte-identically
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * qt[ZIGZAG]
                        block = _T.T @ coef.reshape(8, 8) @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1
    return planes


# ---------------------------------------------------------------------------
# encoder (T.81 Annex D.1 QM coder + F.1.4 statistical models)
# ---------------------------------------------------------------------------


class ArithEncoder:
    """QM arithmetic encoder producing a JPEG entropy-coded segment.
    Carry propagation rolls back through buffered bytes (0xFF -> 0x00);
    JPEG's FF00 byte stuffing is applied at finish()."""

    __slots__ = ("a", "c", "ct", "out")

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.ct = 11  # 16-bit fraction + 3 spacer bits below the byte tap
        self.out = bytearray()

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0
            i -= 1
        if i < 0:
            self.out.insert(0, 1)
        else:
            self.out[i] += 1

    def _emit(self):
        temp = self.c >> 19
        if temp > 0xFF:
            self._carry()
            temp &= 0xFF
        self.out.append(temp)
        self.c &= 0x7FFFF
        self.ct = 8

    def encode(self, stats: bytearray, i: int, bit: int) -> None:
        sv = stats[i]
        idx = sv & 0x7F
        mps = sv >> 7
        qe = _QE[idx]
        self.a -= qe
        if bit != mps:
            # LPS path; conditional exchange when the MPS interval shrank
            # below Qe
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            stats[i] = ((mps ^ _SWITCH[idx]) << 7) | _NLPS[idx]
        else:
            if self.a >= 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | _NMPS[idx]
        while self.a < 0x8000:
            self.a <<= 1
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._emit()

    def finish(self) -> bytes:
        # D.1.8: pick the codestream value in [C, C+A) with the most
        # trailing zeros, then flush the remaining register bytes
        t = (self.a - 1 + self.c) & 0xFFFF0000
        self.c = t + 0x8000 if t < self.c else t
        self.c <<= self.ct
        for _ in range(2):
            temp = self.c >> 19
            if temp > 0xFF:
                self._carry()
                temp &= 0xFF
            self.out.append(temp)
            self.c = (self.c & 0x7FFFF) << 8
        while self.out and self.out[-1] == 0:
            self.out.pop()  # decoders feed zeros past the marker anyway
        stuffed = bytearray()
        for b in self.out:
            stuffed.append(b)
            if b == 0xFF:
                stuffed.append(0x00)
        return bytes(stuffed)


def _encode_dc(enc, st, ctx, diff, L, U):
    """F.1.4.1 mirror of _decode_dc -> next conditioning context."""
    if diff == 0:
        enc.encode(st, ctx, 0)
        return 0
    enc.encode(st, ctx, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(st, ctx + 1, sign)
    v = -diff if sign else diff
    s = ctx + 2 + sign
    m = 0
    v -= 1
    if v:
        enc.encode(st, s, 1)
        m = 1
        s = 20
        v2 = v
        while v2 > 1:
            v2 >>= 1
            enc.encode(st, s, 1)
            m <<= 1
            s += 1
    enc.encode(st, s, 0)
    if m < (1 << L) >> 1:
        nctx = 0
    elif m > (1 << U) >> 1:
        nctx = 12 + sign * 4
    else:
        nctx = 4 + sign * 4
    s += 14
    mm = m
    while mm > 1:
        mm >>= 1
        enc.encode(st, s, 1 if (v & mm) else 0)
    return nctx


def _encode_ac_block(enc, st, kx, zz):
    """F.1.4.2 mirror of _decode_ac_block; zz is zigzag [64] ints."""
    ke = 0
    for k in range(63, 0, -1):
        if zz[k]:
            ke = k
            break
    k = 1
    while k <= ke:
        s = 3 * (k - 1)
        enc.encode(st, s, 0)  # not EOB
        while zz[k] == 0:
            enc.encode(st, s + 1, 0)
            s += 3
            k += 1
        enc.encode(st, s + 1, 1)
        v = int(zz[k])
        sign = 1 if v < 0 else 0
        enc.encode(_FIXED, 0, sign)
        if sign:
            v = -v
        s += 2
        m = 0
        v -= 1
        if v:
            enc.encode(st, s, 1)
            m = 1
            v2 = v
            if v2 > 1:
                v2 >>= 1
                enc.encode(st, s, 1)
                m = 2
                s = 189 if k <= kx else 217
                while v2 > 1:
                    v2 >>= 1
                    enc.encode(st, s, 1)
                    m <<= 1
                    s += 1
        enc.encode(st, s, 0)
        s += 14
        mm = m
        while mm > 1:
            mm >>= 1
            enc.encode(st, s, 1 if (v & mm) else 0)
        k += 1
    if ke < 63:
        enc.encode(st, 3 * ke, 1)  # EOB at the position after the last


def encode_image_jpeg_arith(
    arr: np.ndarray, quality: int = 85, subsampling: str = "420",
) -> bytes:
    """HxWx3 uint8 RGB -> sequential arithmetic-coded (SOF9) JFIF JPEG.

    Same quantized coefficients as the baseline/progressive encoders at
    the same (quality, subsampling) — so the SOF9 stream must decode to
    EXACTLY the pixels of its Huffman twin (the tests' pin, and libjpeg
    agrees). Default T.81 conditioning (L=0, U=1, Kx=5), no DAC segment.
    """
    from .jpeg import _comp_coef_arrays, _dqt_seg, _seg

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
    samp = [(hs, vs), (1, 1), (1, 1)]

    enc = ArithEncoder()
    dc_stats = {0: bytearray(64), 1: bytearray(64)}
    ac_stats = {0: bytearray(256), 1: bytearray(256)}
    dc_ctx = [0, 0, 0]
    last_dc = [0, 0, 0]
    tbl_of = [0, 1, 1]
    for my in range(n_mcu_y):
        for mx in range(n_mcu_x):
            for ci in range(3):
                cs, vs_c = samp[ci]
                tbl = tbl_of[ci]
                for by in range(vs_c):
                    for bx in range(cs):
                        zz = zz_list[ci][my * vs_c + by, mx * cs + bx]
                        diff = int(zz[0]) - last_dc[ci]
                        last_dc[ci] = int(zz[0])
                        dc_ctx[ci] = _encode_dc(
                            enc, dc_stats[tbl], dc_ctx[ci], diff, 0, 1
                        )
                        _encode_ac_block(enc, ac_stats[tbl], 5, zz)
    payload = enc.finish()

    out = bytearray()
    out += b"\xff\xd8"
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, qt_l) + _dqt_seg(1, qt_c)
    out += _seg(
        0xC9,
        bytes([8])
        + h.to_bytes(2, "big")
        + w.to_bytes(2, "big")
        + bytes([3])
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    out += _seg(
        0xDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    out += payload
    out += b"\xff\xd9"
    return bytes(out)
