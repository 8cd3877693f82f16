"""Pure-numpy VP8 intra-frame (keyframe) codec — lossy WebP.

Decoder: full RFC 6386 keyframe path — boolean arithmetic decoder,
segmentation, all four 16x16 / chroma intra modes, all ten 4x4 B_PRED
modes, token decoding with probability updates, dequantization, inverse
WHT + DCT, and both loop filters (simple + normal, §15) — everything a
conforming VP8 intra decoder does except inter-frame tools, which do not
occur in still WebP. Conformance is pinned bit-exact: the decoded Y/U/V
planes must equal the system libwebp's WebPDecodeYUV output for
libwebp-encoded streams (tests/test_vp8.py, skipped when the shared
library is absent — the tables in vp8_tables.py are normative spec data
so the pure-Python path needs no library at runtime).

Encoder: spec-valid intra bitstreams — 4:2:0, one segment, per-MB mode
decision over DC/V/H/TM (optionally B_PRED), default token
probabilities, loop filter level 0. Files decode in libwebp bit-exactly
to the encoder's own reconstruction, which is also the exactness
contract the tests pin.

Reference behavior: zhoujx4/NLP-Series-relation-extraction has no image
path at all; this sits with the other media codecs (functions/jpeg.py,
png.py, tiff.py) behind functions/multimodal.py:decode_image for the
training-data pipeline's multimodal columns.
"""

from __future__ import annotations

import struct

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP,
    COEFF_BANDS,
    COEFF_PROBS_FLAT,
    COEFF_UPDATE_PROBS_FLAT,
    DC_QLOOKUP,
    KF_BMODE_PROBS_FLAT,
    ZIGZAG,
)

COEFF_PROBS0 = np.asarray(COEFF_PROBS_FLAT, dtype=np.uint8).reshape(4, 8, 3, 11)
COEFF_UPDATE_PROBS = np.asarray(COEFF_UPDATE_PROBS_FLAT, dtype=np.uint8).reshape(
    4, 8, 3, 11
)
KF_BMODE_PROBS = np.asarray(KF_BMODE_PROBS_FLAT, dtype=np.uint8).reshape(
    10, 10, 9
)
_ZIG = np.asarray(ZIGZAG, dtype=np.int64)

# intra 16x16 / chroma modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 sub-block modes (RFC 6386 §11.2)
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

# mode trees (RFC 6386 §11.3/§11.5): negative = leaf, else next index pair
KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROBS = (145, 156, 163, 128)
UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROBS = (142, 114, 183)
BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10, -B_RD, -B_VR,
    -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
# implied sub-block mode of a non-B_PRED macroblock (for bmode contexts)
MODE_TO_BMODE = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

# token tree (RFC 6386 §13.2); leaves: 0=EOB, 1=zero, 2.. = value classes
TOK_EOB, TOK_0, TOK_1, TOK_2, TOK_3, TOK_4 = 0, 1, 2, 3, 4, 5
TOK_CAT1, TOK_CAT2, TOK_CAT3, TOK_CAT4, TOK_CAT5, TOK_CAT6 = 6, 7, 8, 9, 10, 11
TOKEN_TREE = (
    -TOK_EOB, 2, -TOK_0, 4, -TOK_1, 6, 8, 12, -TOK_2, 10, -TOK_3, -TOK_4,
    14, 16, -TOK_CAT1, -TOK_CAT2, 18, 20, -TOK_CAT3, -TOK_CAT4,
    -TOK_CAT5, -TOK_CAT6,
)
# extra-bit probabilities and value bases for the large-value categories
CAT_PROBS = (
    (159,),
    (165, 145),
    (173, 148, 140),
    (176, 155, 140, 135),
    (180, 157, 141, 134, 130),
    (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
)
CAT_BASE = (5, 7, 11, 19, 35, 67)


# ---------------------------------------------------------------------------
# boolean coder (RFC 6386 §7)
# ---------------------------------------------------------------------------


class BoolDecoder:
    """RFC 6386 §7.2 boolean decoder; reads past-the-end as zero bytes."""

    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.pos += 1
                self.value |= nxt
        return ret

    def flag(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """RFC 6386 §7.3 boolean encoder."""

    __slots__ = ("out", "range", "bottom", "bit_count")

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def flag(self, bit: int) -> None:
        self.put(128, bit)

    def literal(self, n: int, v: int) -> None:
        for k in range(n - 1, -1, -1):
            self.put(128, (v >> k) & 1)

    def tree(self, tree, probs, leaf: int) -> None:
        # walk the tree to the leaf, emitting the branch bits
        path = []
        found = self._find(tree, 0, leaf, path)
        assert found, (leaf, tree)
        for node, bit in path:
            self.put(probs[node >> 1], bit)

    @staticmethod
    def _find(tree, i, leaf, path) -> bool:
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == -leaf and nxt <= 0:
                path.append((i, bit))
                return True
            if nxt > 0:
                path.append((i, bit))
                if BoolEncoder._find(tree, nxt, leaf, path):
                    return True
                path.pop()
        return False

    def finish(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


# ---------------------------------------------------------------------------
# transforms (RFC 6386 §14.3 / §14.4) — exact integer arithmetic
# ---------------------------------------------------------------------------

_C1 = 20091  # sqrt(2)*cos(pi/8) in Q16, less 1
_C2 = 35468  # sqrt(2)*sin(pi/8) in Q16


def idct4x4(block: np.ndarray) -> np.ndarray:
    """RFC 6386 §14.4 inverse DCT, input int32 4x4 (dequantized)."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), dtype=np.int64)
    # vertical pass (columns)
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    t1 = (ip[1] * _C2) >> 16
    t2 = ip[3] + ((ip[3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = ip[1] + ((ip[1] * _C1) >> 16)
    t2 = (ip[3] * _C2) >> 16
    d1 = t1 + t2
    tmp[0] = a1 + d1
    tmp[3] = a1 - d1
    tmp[1] = b1 + c1
    tmp[2] = b1 - c1
    # horizontal pass (rows), with final rounding
    ip = tmp.T
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    t1 = (ip[1] * _C2) >> 16
    t2 = ip[3] + ((ip[3] * _C1) >> 16)
    c1 = t1 - t2
    t1 = ip[1] + ((ip[1] * _C1) >> 16)
    t2 = (ip[3] * _C2) >> 16
    d1 = t1 + t2
    out = np.empty((4, 4), dtype=np.int64)
    out[0] = (a1 + d1 + 4) >> 3
    out[3] = (a1 - d1 + 4) >> 3
    out[1] = (b1 + c1 + 4) >> 3
    out[2] = (b1 - c1 + 4) >> 3
    return out.T


def iwht4x4(block: np.ndarray) -> np.ndarray:
    """RFC 6386 §14.3 inverse Walsh-Hadamard (Y2 block)."""
    ip = block.astype(np.int64)
    tmp = np.empty((4, 4), dtype=np.int64)
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    tmp[0] = a1 + b1
    tmp[1] = c1 + d1
    tmp[2] = a1 - b1
    tmp[3] = d1 - c1
    ip = tmp.T
    a1 = ip[0] + ip[3]
    b1 = ip[1] + ip[2]
    c1 = ip[1] - ip[2]
    d1 = ip[0] - ip[3]
    out = np.empty((4, 4), dtype=np.int64)
    out[0] = (a1 + b1 + 3) >> 3
    out[1] = (c1 + d1 + 3) >> 3
    out[2] = (a1 - b1 + 3) >> 3
    out[3] = (d1 - c1 + 3) >> 3
    return out.T


def _fdct_matrix() -> np.ndarray:
    """Float forward transform = inverse of the idct's linear map (the
    idct is linear up to rounding), so encoder coefficients reconstruct
    through the exact integer idct with minimal error."""
    M = np.zeros((16, 16))
    for i in range(16):
        e = np.zeros((4, 4), dtype=np.int64)
        e.flat[i] = 4096  # scale up so >>16 rounding is negligible
        # linearized idct without the final rounding bias
        M[:, i] = _idct_float(e).flatten() / 4096.0
    return np.linalg.inv(M)


def _idct_float(block) -> np.ndarray:
    ip = block.astype(np.float64)
    c2 = _C2 / 65536.0
    c1 = 1.0 + _C1 / 65536.0
    tmp = np.empty((4, 4))
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    cc = ip[1] * c2 - ip[3] * c1
    dd = ip[1] * c1 + ip[3] * c2
    tmp[0], tmp[1], tmp[2], tmp[3] = a1 + dd, b1 + cc, b1 - cc, a1 - dd
    ip = tmp.T
    a1 = ip[0] + ip[2]
    b1 = ip[0] - ip[2]
    cc = ip[1] * c2 - ip[3] * c1
    dd = ip[1] * c1 + ip[3] * c2
    out = np.empty((4, 4))
    out[0], out[1], out[2], out[3] = a1 + dd, b1 + cc, b1 - cc, a1 - dd
    return (out / 8.0).T


_FDCT_M = _fdct_matrix()


def fdct4x4(res: np.ndarray) -> np.ndarray:
    """Forward transform matched to idct4x4 (float, rounded)."""
    return np.rint(_FDCT_M @ res.astype(np.float64).flatten()).reshape(4, 4)


def _fwht_matrix() -> np.ndarray:
    """Float forward WHT = inverse of iwht4x4's linear map (the iwht is
    exactly linear when inputs are chosen so >>3 is exact)."""
    M = np.zeros((16, 16))
    for i in range(16):
        e = np.zeros((4, 4), dtype=np.int64)
        e.flat[i] = 8  # multiples of 8 make the final >>3 exact
        M[:, i] = iwht4x4(e).flatten() / 8.0
    return np.linalg.inv(M)


_FWHT_M = _fwht_matrix()


def fwht4x4(dcs: np.ndarray) -> np.ndarray:
    """Forward Walsh-Hadamard matched to iwht4x4 (float, rounded)."""
    return np.rint(_FWHT_M @ dcs.astype(np.float64).flatten()).reshape(4, 4)


# ---------------------------------------------------------------------------
# quantizer (RFC 6386 §9.6 / §14.1)
# ---------------------------------------------------------------------------


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


def quant_factors(qi: int, deltas: dict) -> dict:
    """Per-plane (dc, ac) dequantization factors for a quantizer index."""
    y1dc = DC_QLOOKUP[_clamp_q(qi + deltas.get("y1dc", 0))]
    y1ac = AC_QLOOKUP[_clamp_q(qi)]
    y2dc = DC_QLOOKUP[_clamp_q(qi + deltas.get("y2dc", 0))] * 2
    y2ac = AC_QLOOKUP[_clamp_q(qi + deltas.get("y2ac", 0))] * 155 // 100
    if y2ac < 8:
        y2ac = 8
    uvdc_i = qi + deltas.get("uvdc", 0)
    uvdc = DC_QLOOKUP[117 if uvdc_i > 117 else _clamp_q(uvdc_i)]
    uvac = AC_QLOOKUP[_clamp_q(qi + deltas.get("uvac", 0))]
    return {"y1": (y1dc, y1ac), "y2": (y2dc, y2ac), "uv": (uvdc, uvac)}


# ---------------------------------------------------------------------------
# intra prediction (RFC 6386 §12)
# ---------------------------------------------------------------------------


def _pred16_dc(above, left, have_a, have_l) -> np.ndarray:
    if have_a and have_l:
        v = (int(above.sum()) + int(left.sum()) + 16) >> 5
    elif have_a:
        v = (int(above.sum()) + 8) >> 4
    elif have_l:
        v = (int(left.sum()) + 8) >> 4
    else:
        v = 128
    return np.full((16, 16), v, dtype=np.int64)


def _pred8_dc(above, left, have_a, have_l) -> np.ndarray:
    if have_a and have_l:
        v = (int(above.sum()) + int(left.sum()) + 8) >> 4
    elif have_a:
        v = (int(above.sum()) + 4) >> 3
    elif have_l:
        v = (int(left.sum()) + 4) >> 3
    else:
        v = 128
    return np.full((8, 8), v, dtype=np.int64)


def _pred_block(mode, size, above, left, al) -> np.ndarray:
    """V / H / TM prediction for a size x size block (16x16 or 8x8)."""
    if mode == V_PRED:
        return np.tile(above.astype(np.int64), (size, 1))
    if mode == H_PRED:
        return np.tile(left.astype(np.int64)[:, None], (1, size))
    # TM
    p = above.astype(np.int64)[None, :] + left.astype(np.int64)[:, None] - al
    return np.clip(p, 0, 255)


def _pred4(mode: int, A: np.ndarray, L: np.ndarray, P: int) -> np.ndarray:
    """4x4 sub-block prediction. A = 8 above pixels (4 + 4 above-right),
    L = 4 left pixels, P = above-left. RFC 6386 §12.3, exact."""
    A = A.astype(np.int64)
    L = L.astype(np.int64)
    B = np.empty((4, 4), dtype=np.int64)
    if mode == B_DC:
        B[:] = (int(A[:4].sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM:
        B[:] = np.clip(A[None, :4] + L[:, None] - P, 0, 255)
    elif mode == B_VE:
        # filtered above: (P,A0..A4) 1-2-1
        r = np.empty(4, dtype=np.int64)
        r[0] = (P + 2 * A[0] + A[1] + 2) >> 2
        r[1] = (A[0] + 2 * A[1] + A[2] + 2) >> 2
        r[2] = (A[1] + 2 * A[2] + A[3] + 2) >> 2
        r[3] = (A[2] + 2 * A[3] + A[4] + 2) >> 2
        B[:] = r[None, :]
    elif mode == B_HE:
        c = np.empty(4, dtype=np.int64)
        c[0] = (P + 2 * L[0] + L[1] + 2) >> 2
        c[1] = (L[0] + 2 * L[1] + L[2] + 2) >> 2
        c[2] = (L[1] + 2 * L[2] + L[3] + 2) >> 2
        c[3] = (L[2] + 2 * L[3] + L[3] + 2) >> 2
        B[:] = c[:, None]
    elif mode == B_LD:
        a = A
        def f(i, j, k):
            return (a[i] + 2 * a[j] + a[k] + 2) >> 2
        B[0, 0] = f(0, 1, 2)
        B[0, 1] = B[1, 0] = f(1, 2, 3)
        B[0, 2] = B[1, 1] = B[2, 0] = f(2, 3, 4)
        B[0, 3] = B[1, 2] = B[2, 1] = B[3, 0] = f(3, 4, 5)
        B[1, 3] = B[2, 2] = B[3, 1] = f(4, 5, 6)
        B[2, 3] = B[3, 2] = f(5, 6, 7)
        B[3, 3] = (a[6] + 3 * a[7] + 2) >> 2
    elif mode == B_RD:
        e = np.array(
            [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]],
            dtype=np.int64,
        )
        def g(i):
            return (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
        # diagonal: B[r,c] depends only on c - r
        for r in range(4):
            for c in range(4):
                B[r, c] = g(3 - r + c)
    elif mode == B_VR:
        e = np.array(
            [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]],
            dtype=np.int64,
        )
        def g(i):
            return (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
        def h(i):
            return (e[i] + e[i + 1] + 1) >> 1
        B[3, 0] = g(1)
        B[2, 0] = g(2)
        B[3, 1] = B[1, 0] = g(3)
        B[2, 1] = B[0, 0] = h(4)
        B[3, 2] = B[1, 1] = g(4)
        B[2, 2] = B[0, 1] = h(5)
        B[3, 3] = B[1, 2] = g(5)
        B[2, 3] = B[0, 2] = h(6)
        B[1, 3] = g(6)
        B[0, 3] = h(7)
    elif mode == B_VL:
        a = A
        def g(i):
            return (a[i] + 2 * a[i + 1] + a[i + 2] + 2) >> 2
        def h(i):
            return (a[i] + a[i + 1] + 1) >> 1
        B[0, 0] = h(0)
        B[1, 0] = g(0)
        B[2, 0] = B[0, 1] = h(1)
        B[1, 1] = B[3, 0] = g(1)
        B[2, 1] = B[0, 2] = h(2)
        B[3, 1] = B[1, 2] = g(2)
        B[2, 2] = B[0, 3] = h(3)
        B[3, 2] = B[1, 3] = g(3)
        B[2, 3] = g(4)
        B[3, 3] = g(5)
    elif mode == B_HD:
        e = np.array(
            [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2]],
            dtype=np.int64,
        )
        def g(i):
            return (e[i] + 2 * e[i + 1] + e[i + 2] + 2) >> 2
        def h(i):
            return (e[i] + e[i + 1] + 1) >> 1
        B[3, 0] = h(0)
        B[3, 1] = g(0)
        B[2, 0] = B[3, 2] = h(1)
        B[2, 1] = B[3, 3] = g(1)
        B[2, 2] = B[1, 0] = h(2)
        B[2, 3] = B[1, 1] = g(2)
        B[1, 2] = B[0, 0] = h(3)
        B[1, 3] = B[0, 1] = g(3)
        B[0, 2] = g(4)
        B[0, 3] = g(5)
    elif mode == B_HU:
        l = L
        def g(i, j, k):
            return (l[i] + 2 * l[j] + l[k] + 2) >> 2
        def h(i, j):
            return (l[i] + l[j] + 1) >> 1
        B[0, 0] = h(0, 1)
        B[0, 1] = g(0, 1, 2)
        B[0, 2] = B[1, 0] = h(1, 2)
        B[0, 3] = B[1, 1] = g(1, 2, 3)
        B[1, 2] = B[2, 0] = h(2, 3)
        B[1, 3] = B[2, 1] = g(2, 3, 3)
        B[2, 2] = B[2, 3] = B[3, 0] = B[3, 1] = B[3, 2] = B[3, 3] = l[3]
    else:
        raise ValueError(f"bad bmode {mode}")
    return B


# ---------------------------------------------------------------------------
# keyframe decoder
# ---------------------------------------------------------------------------


def _clamp63(v: int) -> int:
    return 0 if v < 0 else (63 if v > 63 else v)


class _FrameHeader:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_quant", "seg_lf",
        "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_delta", "mode_lf_delta",
        "qi", "q_deltas", "coeff_probs", "mb_no_skip", "prob_skip",
        "partitions",
    )


def _parse_header(data: bytes):
    """Parse the uncompressed frame tag + first (header) partition of a
    VP8 keyframe. Returns (_FrameHeader, BoolDecoder positioned at the
    per-MB mode data, token partitions as BoolDecoders)."""
    if len(data) < 10:
        raise ValueError("VP8: truncated frame")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise ValueError("VP8: not a key frame (interframe unsupported)")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    w_raw = struct.unpack("<H", data[6:8])[0]
    h_raw = struct.unpack("<H", data[8:10])[0]
    h = _FrameHeader()
    h.width = w_raw & 0x3FFF
    h.height = h_raw & 0x3FFF
    h.mb_w = (h.width + 15) >> 4
    h.mb_h = (h.height + 15) >> 4
    part1 = data[10 : 10 + part1_size]
    bd = BoolDecoder(part1)
    bd.flag()  # color space (must be 0 for conforming streams)
    bd.flag()  # clamping type

    # segmentation (RFC 6386 §9.3)
    h.seg_quant = [0, 0, 0, 0]
    h.seg_lf = [0, 0, 0, 0]
    h.seg_abs = 0
    h.seg_update_map = 0
    h.seg_tree_probs = [255, 255, 255]
    h.seg_enabled = bd.flag()
    if h.seg_enabled:
        h.seg_update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            h.seg_abs = bd.flag()
            for i in range(4):
                if bd.flag():
                    h.seg_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.flag():
                    h.seg_lf[i] = bd.signed_literal(6)
        if h.seg_update_map:
            for i in range(3):
                h.seg_tree_probs[i] = bd.literal(8) if bd.flag() else 255

    # loop filter header (§9.4)
    h.filter_type = bd.flag()  # 1 = simple
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.flag()
    h.ref_lf_delta = [0, 0, 0, 0]
    h.mode_lf_delta = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.flag():  # delta update
            for i in range(4):
                if bd.flag():
                    h.ref_lf_delta[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.flag():
                    h.mode_lf_delta[i] = bd.signed_literal(6)

    # token partitions (§9.5)
    n_parts = 1 << bd.literal(2)
    rest = data[10 + part1_size :]
    sizes = []
    off = (n_parts - 1) * 3
    for i in range(n_parts - 1):
        sizes.append(
            rest[i * 3] | (rest[i * 3 + 1] << 8) | (rest[i * 3 + 2] << 16)
        )
    parts = []
    pos = off
    for i in range(n_parts):
        if i < n_parts - 1:
            parts.append(BoolDecoder(rest[pos : pos + sizes[i]]))
            pos += sizes[i]
        else:
            parts.append(BoolDecoder(rest[pos:]))
    h.partitions = parts

    # quantizer (§9.6)
    h.qi = bd.literal(7)
    h.q_deltas = {}
    for key in ("y1dc", "y2dc", "y2ac", "uvdc", "uvac"):
        h.q_deltas[key] = bd.signed_literal(4) if bd.flag() else 0

    bd.flag()  # refresh entropy probs (no effect on a single keyframe)

    # token probability updates (§13.4)
    probs = COEFF_PROBS0.copy()
    up = COEFF_UPDATE_PROBS
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    if bd.get(int(up[t, b, c, p])):
                        probs[t, b, c, p] = bd.literal(8)
    h.coeff_probs = probs

    h.mb_no_skip = bd.flag()
    h.prob_skip = bd.literal(8) if h.mb_no_skip else 0
    return h, bd


_SEG_TREE = (2, 4, -0, -1, -2, -3)


def _decode_modes(h: _FrameHeader, bd: BoolDecoder):
    """Per-MB intra mode decode (partition 1, whole frame, raster order).
    Returns lists of per-MB dicts."""
    mb_w, mb_h = h.mb_w, h.mb_h
    # bmode context rows: above[mb_w*4], left[4]
    above_bm = [B_DC] * (mb_w * 4)
    mbs = []
    for my in range(mb_h):
        left_bm = [B_DC] * 4
        for mx in range(mb_w):
            mb = {"seg": 0, "skip": 0}
            if h.seg_enabled and h.seg_update_map:
                mb["seg"] = bd.tree(_SEG_TREE, h.seg_tree_probs)
            if h.mb_no_skip:
                mb["skip"] = bd.get(h.prob_skip)
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            mb["ymode"] = ymode
            if ymode == B_PRED:
                bmodes = []
                for sy in range(4):
                    for sx in range(4):
                        a = (
                            above_bm[mx * 4 + sx]
                            if sy == 0
                            else bmodes[(sy - 1) * 4 + sx]
                        )
                        l = (
                            left_bm[sy]
                            if sx == 0
                            else bmodes[sy * 4 + sx - 1]
                        )
                        bm = bd.tree(BMODE_TREE, KF_BMODE_PROBS[a][l])
                        bmodes.append(bm)
                mb["bmodes"] = bmodes
                for sx in range(4):
                    above_bm[mx * 4 + sx] = bmodes[12 + sx]
                for sy in range(4):
                    left_bm[sy] = bmodes[sy * 4 + 3]
            else:
                implied = MODE_TO_BMODE[ymode]
                mb["bmodes"] = None
                for sx in range(4):
                    above_bm[mx * 4 + sx] = implied
                for sy in range(4):
                    left_bm[sy] = implied
            mb["uvmode"] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            mbs.append(mb)
    return mbs


def _decode_block_coeffs(bd, probs, plane, ctx, first, qdc, qac):
    """Token-decode one 4x4 coefficient block; returns (int64 4x4
    dequantized coefficients in raster order, has_nonzero)."""
    coeffs = np.zeros(16, dtype=np.int64)
    i = first
    nz = False
    skip_eob = False
    while i < 16:
        p = probs[plane][COEFF_BANDS[i]][ctx]
        if not skip_eob:
            if not bd.get(int(p[0])):
                break
        if not bd.get(int(p[1])):  # zero
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        if not bd.get(int(p[2])):
            v = 1
            ctx = 2 if False else 1
        else:
            ctx = 2
            if not bd.get(int(p[3])):
                if not bd.get(int(p[4])):
                    v = 2
                else:
                    v = 3 + bd.get(int(p[5]))
            else:
                if not bd.get(int(p[6])):
                    cat = 0 if not bd.get(int(p[7])) else 1
                else:
                    if not bd.get(int(p[8])):
                        cat = 2 if not bd.get(int(p[9])) else 3
                    else:
                        cat = 4 if not bd.get(int(p[10])) else 5
                v = CAT_BASE[cat]
                extra = 0
                for cp in CAT_PROBS[cat]:
                    extra = (extra << 1) | bd.get(cp)
                v += extra
        if bd.get(128):
            v = -v
        q = qdc if i == 0 else qac
        coeffs[ZIGZAG[i]] = v * q
        nz = True
        i += 1
    return coeffs.reshape(4, 4), nz


def _decode_webp_vp8_frame(data: bytes):
    """Decode a VP8 keyframe payload to unclipped-size (Y, U, V) planes
    (cropped to frame dimensions) plus the header."""
    h, bd = _parse_header(data)
    mbs = _decode_modes(h, bd)
    mb_w, mb_h = h.mb_w, h.mb_h
    W, H = mb_w * 16, mb_h * 16
    Y = np.zeros((H, W), dtype=np.int64)
    U = np.zeros((H >> 1, W >> 1), dtype=np.int64)
    V = np.zeros((H >> 1, W >> 1), dtype=np.int64)

    # per-segment quant factors
    seg_q = []
    for s in range(4):
        if h.seg_enabled:
            qi = h.seg_quant[s] if h.seg_abs else h.qi + h.seg_quant[s]
        else:
            qi = h.qi
        seg_q.append(quant_factors(_clamp_q(qi) if False else max(0, min(127, qi)), h.q_deltas))

    probs = h.coeff_probs
    # nz contexts
    above_y = np.zeros((mb_w, 4), dtype=np.int64)
    above_u = np.zeros((mb_w, 2), dtype=np.int64)
    above_v = np.zeros((mb_w, 2), dtype=np.int64)
    above_y2 = np.zeros(mb_w, dtype=np.int64)

    for my in range(mb_h):
        left_y = np.zeros(4, dtype=np.int64)
        left_u = np.zeros(2, dtype=np.int64)
        left_v = np.zeros(2, dtype=np.int64)
        left_y2 = 0
        td = h.partitions[my % len(h.partitions)]
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            ymode = mb["ymode"]
            has_y2 = ymode != B_PRED
            q = seg_q[mb["seg"]]
            ycoeffs = [None] * 16
            ucoeffs = [None] * 4
            vcoeffs = [None] * 4
            y2_out = None
            mb_has_coeffs = False
            if mb["skip"]:
                left_y[:] = 0
                left_u[:] = 0
                left_v[:] = 0
                above_y[mx, :] = 0
                above_u[mx, :] = 0
                above_v[mx, :] = 0
                if has_y2:
                    left_y2 = 0
                    above_y2[mx] = 0
            else:
                if has_y2:
                    ctx = int(above_y2[mx] + left_y2)
                    c2, nz2 = _decode_block_coeffs(
                        td, probs, 1, ctx, 0, q["y2"][0], q["y2"][1]
                    )
                    above_y2[mx] = left_y2 = int(nz2)
                    y2_out = iwht4x4(c2)
                    # NOTE: do NOT fold nz2 itself into mb_has_coeffs —
                    # libwebp's inner-loop-filter flag only sees the
                    # post-WHT DC values (NzCodeBits in vp8_dec.c), and a
                    # nonzero Y2 block can inverse-transform to all-zero
                    # DCs; the y2_out[sy, sx] != 0 term below matches.
                plane = 0 if has_y2 else 3
                first = 1 if has_y2 else 0
                for sy in range(4):
                    for sx in range(4):
                        ctx = int(above_y[mx, sx] + left_y[sy])
                        cb, nzb = _decode_block_coeffs(
                            td, probs, plane, ctx, first,
                            q["y1"][0], q["y1"][1],
                        )
                        above_y[mx, sx] = left_y[sy] = int(nzb)
                        if y2_out is not None:
                            cb[0, 0] = y2_out[sy, sx]
                        ycoeffs[sy * 4 + sx] = cb
                        mb_has_coeffs |= nzb or (
                            y2_out is not None and y2_out[sy, sx] != 0
                        )
                for comp, store, above_c, left_c in (
                    (0, ucoeffs, above_u, left_u),
                    (1, vcoeffs, above_v, left_v),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = int(above_c[mx, sx] + left_c[sy])
                            cb, nzb = _decode_block_coeffs(
                                td, probs, 2, ctx, 0,
                                q["uv"][0], q["uv"][1],
                            )
                            above_c[mx, sx] = left_c[sy] = int(nzb)
                            store[sy * 2 + sx] = cb
                            mb_has_coeffs |= nzb
            mb["has_coeffs"] = bool(mb_has_coeffs)

            # ---- reconstruct: intra predict + idct-add (unfiltered) ----
            x0, y0 = mx * 16, my * 16
            have_a, have_l = my > 0, mx > 0
            if ymode == B_PRED:
                # above row incl. above-right (20 px) and left column
                arow = np.empty(20, dtype=np.int64)
                if have_a:
                    arow[:16] = Y[y0 - 1, x0 : x0 + 16]
                    if mx + 1 < mb_w:
                        arow[16:] = Y[y0 - 1, x0 + 16 : x0 + 20]
                    else:
                        # rightmost MB: libwebp/libvpx replicate the above
                        # row's last pixel as the above-right samples
                        arow[16:] = Y[y0 - 1, x0 + 15]
                else:
                    arow[:] = 127
                lcol = (
                    Y[y0 : y0 + 16, x0 - 1]
                    if have_l
                    else np.full(16, 129, dtype=np.int64)
                )
                # corner fallback: top row => 127 (the above-127 row
                # extends one pixel left); left column below the top
                # => 129 (the left-129 column extends one pixel up)
                al = (
                    Y[y0 - 1, x0 - 1]
                    if (have_a and have_l)
                    else (129 if have_a else 127)
                )
                blk = np.zeros((16, 16), dtype=np.int64)
                for sy in range(4):
                    for sx in range(4):
                        # A: 4 above + 4 above-right of this subblock
                        if sy == 0:
                            A = arow[sx * 4 : sx * 4 + 8].copy()
                            if sx == 3:
                                A[4:] = arow[16:20]
                        else:
                            up = blk[sy * 4 - 1]
                            if sx < 3:
                                A = np.empty(8, dtype=np.int64)
                                A[:4] = up[sx * 4 : sx * 4 + 4]
                                A[4:] = up[sx * 4 + 4 : sx * 4 + 8]
                            else:
                                # above-right of lower-right subblocks:
                                # VP8 reuses the row above the MB
                                A = np.empty(8, dtype=np.int64)
                                A[:4] = up[12:16]
                                A[4:] = arow[16:20]
                        if sx == 0:
                            L = lcol[sy * 4 : sy * 4 + 4]
                        else:
                            L = blk[sy * 4 : sy * 4 + 4, sx * 4 - 1]
                        if sy == 0 and sx == 0:
                            P = al
                        elif sy == 0:
                            P = arow[sx * 4 - 1]
                        elif sx == 0:
                            P = lcol[sy * 4 - 1]
                        else:
                            P = blk[sy * 4 - 1, sx * 4 - 1]
                        pred = _pred4(mb["bmodes"][sy * 4 + sx], A, L, int(P))
                        cb = ycoeffs[sy * 4 + sx]
                        res = idct4x4(cb) if cb is not None else 0
                        rec = np.clip(pred + res, 0, 255)
                        blk[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] = rec
                Y[y0 : y0 + 16, x0 : x0 + 16] = blk
            else:
                above = (
                    Y[y0 - 1, x0 : x0 + 16]
                    if have_a
                    else np.full(16, 127, dtype=np.int64)
                )
                left = (
                    Y[y0 : y0 + 16, x0 - 1]
                    if have_l
                    else np.full(16, 129, dtype=np.int64)
                )
                al = (
                    Y[y0 - 1, x0 - 1]
                    if (have_a and have_l)
                    else (129 if have_a else 127)
                )
                if ymode == DC_PRED:
                    pred = _pred16_dc(above, left, have_a, have_l)
                else:
                    pred = _pred_block(ymode, 16, above, left, int(al))
                blk = pred.copy()
                for sy in range(4):
                    for sx in range(4):
                        cb = ycoeffs[sy * 4 + sx]
                        if cb is not None:
                            blk[
                                sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4
                            ] += idct4x4(cb)
                Y[y0 : y0 + 16, x0 : x0 + 16] = np.clip(blk, 0, 255)

            # chroma
            cx0, cy0 = mx * 8, my * 8
            for comp, plane_arr, coeffs in (
                (0, U, ucoeffs), (1, V, vcoeffs)
            ):
                above = (
                    plane_arr[cy0 - 1, cx0 : cx0 + 8]
                    if have_a
                    else np.full(8, 127, dtype=np.int64)
                )
                left = (
                    plane_arr[cy0 : cy0 + 8, cx0 - 1]
                    if have_l
                    else np.full(8, 129, dtype=np.int64)
                )
                al = (
                    plane_arr[cy0 - 1, cx0 - 1]
                    if (have_a and have_l)
                    else (129 if have_a else 127)
                )
                uvmode = mb["uvmode"]
                if uvmode == DC_PRED:
                    pred = _pred8_dc(above, left, have_a, have_l)
                else:
                    pred = _pred_block(uvmode, 8, above, left, int(al))
                blk = pred.copy()
                for sy in range(2):
                    for sx in range(2):
                        cb = coeffs[sy * 2 + sx]
                        if cb is not None:
                            blk[
                                sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4
                            ] += idct4x4(cb)
                plane_arr[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(blk, 0, 255)

    # ---- loop filter ----
    if h.filter_level:
        _loop_filter(h, mbs, Y, U, V)

    return (
        Y[: h.height, : h.width].astype(np.uint8),
        U[: (h.height + 1) >> 1, : (h.width + 1) >> 1].astype(np.uint8),
        V[: (h.height + 1) >> 1, : (h.width + 1) >> 1].astype(np.uint8),
        h,
    )


# ---------------------------------------------------------------------------
# loop filter (RFC 6386 §15) — vectorized across each 16/8-pixel edge
# ---------------------------------------------------------------------------
#
# All arithmetic follows the RFC's signed-8-bit pseudocode exactly:
# pixels are mapped u->s by subtracting 128, every intermediate is
# clamped to [-128, 127] with _c(), and >> on negatives is arithmetic
# (numpy int64 semantics == C signed shift). An "edge segment" is an
# (n, 8) view [p3 p2 p1 p0 | q0 q1 q2 q3] across the edge; writes go
# through the view back into the plane, so filters compose in the same
# order libwebp applies them (left MB edge, inner vertical, top MB
# edge, inner horizontal — raster MB order).


def _c(x):
    return np.clip(x, -128, 127)


def _common_adjust(seg, mask, use_outer):
    """§15.2 common_adjust on the masked rows; returns F (the Q0 step)."""
    P1 = seg[:, 2].astype(np.int64) - 128
    P0 = seg[:, 3].astype(np.int64) - 128
    Q0 = seg[:, 4].astype(np.int64) - 128
    Q1 = seg[:, 5].astype(np.int64) - 128
    outer = _c(P1 - Q1) if use_outer else 0
    a = _c(outer + 3 * (Q0 - P0))
    F = _c(a + 4) >> 3
    E = _c(a + 3) >> 3
    seg[:, 4] = np.where(mask, _c(Q0 - F) + 128, seg[:, 4])
    seg[:, 3] = np.where(mask, _c(P0 + E) + 128, seg[:, 3])
    return F


def _simple_filter(seg, edge_limit):
    p1 = seg[:, 2].astype(np.int64)
    p0 = seg[:, 3].astype(np.int64)
    q0 = seg[:, 4].astype(np.int64)
    q1 = seg[:, 5].astype(np.int64)
    mask = (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2) <= edge_limit
    if mask.any():
        _common_adjust(seg, mask, True)


def _filter_mask_hev(seg, interior, edge_limit, hev_thresh):
    s = seg.astype(np.int64)
    p3, p2, p1, p0, q0, q1, q2, q3 = (s[:, i] for i in range(8))
    mask = (
        ((np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2) <= edge_limit)
        & (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q3 - q2) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q1 - q0) <= interior)
    )
    hev = (np.abs(p1 - p0) > hev_thresh) | (np.abs(q1 - q0) > hev_thresh)
    return mask, hev


def _subblock_filter(seg, interior, edge_limit, hev_thresh):
    """§15.3 subblock_filter: common adjust; non-hev rows also nudge
    P1/Q1 by (F+1)>>1."""
    mask, hev = _filter_mask_hev(seg, interior, edge_limit, hev_thresh)
    if not mask.any():
        return
    P1 = seg[:, 2].astype(np.int64) - 128
    Q1 = seg[:, 5].astype(np.int64) - 128
    # use_outer_taps = hev per row: do the two populations separately
    F = np.zeros(seg.shape[0], dtype=np.int64)
    m_hev = mask & hev
    m_std = mask & ~hev
    if m_hev.any():
        _common_adjust(seg, m_hev, True)
    if m_std.any():
        F = _common_adjust(seg, m_std, False)
        a = (F + 1) >> 1
        seg[:, 5] = np.where(m_std, _c(Q1 - a) + 128, seg[:, 5])
        seg[:, 2] = np.where(m_std, _c(P1 + a) + 128, seg[:, 2])


def _mb_filter(seg, interior, edge_limit, hev_thresh):
    """§15.3 mb_filter (macroblock edges): hev rows get common_adjust,
    others the 27/18/9-weight smoothing over three pixels each side."""
    mask, hev = _filter_mask_hev(seg, interior, edge_limit, hev_thresh)
    if not mask.any():
        return
    m_hev = mask & hev
    m_std = mask & ~hev
    if m_hev.any():
        _common_adjust(seg, m_hev, True)
    if m_std.any():
        s = seg.astype(np.int64) - 128
        p2, p1, p0, q0, q1, q2 = (s[:, i] for i in range(1, 7))
        w = _c(_c(p1 - q1) + 3 * (q0 - p0))
        a = _c((27 * w + 63) >> 7)
        seg[:, 4] = np.where(m_std, _c(q0 - a) + 128, seg[:, 4])
        seg[:, 3] = np.where(m_std, _c(p0 + a) + 128, seg[:, 3])
        a = _c((18 * w + 63) >> 7)
        seg[:, 5] = np.where(m_std, _c(q1 - a) + 128, seg[:, 5])
        seg[:, 2] = np.where(m_std, _c(p1 + a) + 128, seg[:, 2])
        a = _c((9 * w + 63) >> 7)
        seg[:, 6] = np.where(m_std, _c(q2 - a) + 128, seg[:, 6])
        seg[:, 1] = np.where(m_std, _c(p2 + a) + 128, seg[:, 1])


def _v_edge(plane, x, y0, n):
    """(n, 8) view across the vertical edge at column x (rows y0..y0+n)."""
    return plane[y0 : y0 + n, x - 4 : x + 4]


def _h_edge(plane, y, x0, n):
    """(n, 8) view across the horizontal edge at row y (cols x0..x0+n)."""
    return plane[y - 4 : y + 4, x0 : x0 + n].T


def _lf_strengths(h: _FrameHeader):
    """Per-(segment, is_b_pred) (edge_limit_base, interior, hev) —
    libwebp PrecomputeFilterStrengths; level 0 => no filtering."""
    out = {}
    for s in range(4):
        if h.seg_enabled:
            base = h.seg_lf[s] if h.seg_abs else h.filter_level + h.seg_lf[s]
        else:
            base = h.filter_level
        for i4 in (0, 1):
            level = base
            if h.lf_delta_enabled:
                level += h.ref_lf_delta[0]
                if i4:
                    level += h.mode_lf_delta[0]
            level = _clamp63(level)
            if level == 0:
                out[(s, i4)] = None
                continue
            ilevel = level
            if h.sharpness > 0:
                ilevel >>= 2 if h.sharpness > 4 else 1
                if ilevel > 9 - h.sharpness:
                    ilevel = 9 - h.sharpness
            if ilevel < 1:
                ilevel = 1
            hev = 2 if level >= 40 else (1 if level >= 15 else 0)
            out[(s, i4)] = (2 * level + ilevel, ilevel, hev)
    return out


def _loop_filter(h: _FrameHeader, mbs, Y, U, V) -> None:
    """Apply the in-loop deblocking filter to the mb-aligned planes.
    filter_type 1 = simple (luma only), 0 = normal (luma + chroma)."""
    strengths = _lf_strengths(h)
    simple = bool(h.filter_type)
    for my in range(h.mb_h):
        for mx in range(h.mb_w):
            mb = mbs[my * h.mb_w + mx]
            i4 = 1 if mb["ymode"] == B_PRED else 0
            st = strengths[(mb["seg"], i4)]
            if st is None:
                continue
            limit, ilevel, hev = st
            inner = bool(i4) or mb["has_coeffs"]
            x0, y0 = mx * 16, my * 16
            cx0, cy0 = mx * 8, my * 8
            if simple:
                if mx > 0:
                    _simple_filter(_v_edge(Y, x0, y0, 16), limit + 4)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_filter(_v_edge(Y, x0 + dx, y0, 16), limit)
                if my > 0:
                    _simple_filter(_h_edge(Y, y0, x0, 16), limit + 4)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_filter(_h_edge(Y, y0 + dy, x0, 16), limit)
            else:
                if mx > 0:
                    _mb_filter(_v_edge(Y, x0, y0, 16), ilevel, limit + 4, hev)
                    _mb_filter(_v_edge(U, cx0, cy0, 8), ilevel, limit + 4, hev)
                    _mb_filter(_v_edge(V, cx0, cy0, 8), ilevel, limit + 4, hev)
                if inner:
                    for dx in (4, 8, 12):
                        _subblock_filter(
                            _v_edge(Y, x0 + dx, y0, 16), ilevel, limit, hev
                        )
                    _subblock_filter(
                        _v_edge(U, cx0 + 4, cy0, 8), ilevel, limit, hev
                    )
                    _subblock_filter(
                        _v_edge(V, cx0 + 4, cy0, 8), ilevel, limit, hev
                    )
                if my > 0:
                    _mb_filter(_h_edge(Y, y0, x0, 16), ilevel, limit + 4, hev)
                    _mb_filter(_h_edge(U, cy0, cx0, 8), ilevel, limit + 4, hev)
                    _mb_filter(_h_edge(V, cy0, cx0, 8), ilevel, limit + 4, hev)
                if inner:
                    for dy in (4, 8, 12):
                        _subblock_filter(
                            _h_edge(Y, y0 + dy, x0, 16), ilevel, limit, hev
                        )
                    _subblock_filter(
                        _h_edge(U, cy0 + 4, cx0, 8), ilevel, limit, hev
                    )
                    _subblock_filter(
                        _h_edge(V, cy0 + 4, cx0, 8), ilevel, limit, hev
                    )


# ---------------------------------------------------------------------------
# WebP RIFF container + public API
# ---------------------------------------------------------------------------


def _find_image_chunk(content: bytes):
    """Walk the RIFF/WEBP chunk list; return (fourcc, body) of the still
    image chunk ('VP8 ' lossy or 'VP8L' lossless)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    pos = 12
    end = min(len(content), 8 + struct.unpack("<I", content[4:8])[0])
    animated = False
    while pos + 8 <= end:
        fourcc = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        body = content[pos + 8 : pos + 8 + size]
        if fourcc in (b"VP8 ", b"VP8L"):
            return fourcc, body
        if fourcc in (b"ANIM", b"ANMF"):
            animated = True
        # VP8X / ALPH / ICCP / EXIF / XMP: skip — the still image is
        # carried in a later image chunk
        pos += 8 + size + (size & 1)
    if animated:
        raise NotImplementedError(
            "container is animated (ANIM/ANMF) — decode it with "
            "decode_webp_animation; stills (VP8/VP8L) decode here"
        )
    raise ValueError("WebP container has no image chunk")


def _find_vp8_chunk(content: bytes) -> bytes:
    """The lossy 'VP8 ' payload (decode_webp_yuv's native-plane contract
    only exists for lossy streams)."""
    fourcc, body = _find_image_chunk(content)
    if fourcc != b"VP8 ":
        raise ValueError(
            "stream is lossless (VP8L) — it has no YUV planes; use "
            "decode_image_webp / functions.vp8l"
        )
    return body


def decode_webp_yuv(content: bytes):
    """Decode lossy WebP to its native (Y, U, V) 4:2:0 planes (uint8,
    cropped to frame size). Bit-exact vs libwebp WebPDecodeYUV — the
    conformance contract pinned in tests/test_vp8.py."""
    Y, U, V, _h = _decode_webp_vp8_frame(_find_vp8_chunk(content))
    return Y, U, V


def _yuv420_to_rgb(Y: np.ndarray, U: np.ndarray, V: np.ndarray) -> np.ndarray:
    """BT.601 limited-range YUV 4:2:0 -> HxWx3 uint8 RGB with 2x nearest
    chroma upsample (deterministic; RGB conversion is outside the VP8
    bitstream spec, so no bit-exactness contract here)."""
    h, w = Y.shape
    u = U.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.int64) - 128
    v = V.repeat(2, axis=0).repeat(2, axis=1)[:h, :w].astype(np.int64) - 128
    c = (Y.astype(np.int64) - 16) * 298
    r = (c + 409 * v + 128) >> 8
    g = (c - 100 * u - 208 * v + 128) >> 8
    b = (c + 516 * u + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_image_webp(content: bytes) -> np.ndarray:
    """WebP -> HxWx3 uint8 RGB: lossy VP8 keyframes decode here (4:2:0
    planes + BT.601 upconvert), lossless VP8L via functions/vp8l.py
    (exact pixels), animated containers as their first composited frame.
    Sniffed from the container."""
    try:
        fourcc, body = _find_image_chunk(content)
    except NotImplementedError:
        # animated container: return the first composited frame
        frames, _durs = decode_webp_animation(content)
        return frames[0][..., :3].copy()
    if fourcc == b"VP8L":
        from .vp8l import decode_image_webp_lossless

        return decode_image_webp_lossless(content)
    Y, U, V, _h = _decode_webp_vp8_frame(body)
    return _yuv420_to_rgb(Y, U, V)


# ---------------------------------------------------------------------------
# encoder — spec-valid VP8 keyframes (lossy WebP writer)
# ---------------------------------------------------------------------------
#
# Design: one segment, default token probabilities, loop filter level 0
# (so the decoder's output IS the encoder's reconstruction — the
# exactness contract tests pin against libwebp), one token partition,
# per-MB mode decision over DC/V/H/TM for luma and chroma by SAD against
# the in-loop reconstruction. Quantized levels are chosen by nearest
# rounding against the RFC dequantization factors; reconstruction runs
# the decoder's own exact integer transforms so encoder and any
# conforming decoder agree bit-for-bit.


def _rgb_to_yuv420(arr: np.ndarray):
    """BT.601 limited-range RGB -> Y + 2x2-box-averaged U/V (the same
    colorspace libwebp's simple encode API uses; exact coefficients
    differ slightly, which only shifts pixel values pre-quantization)."""
    a = arr.astype(np.int64)
    r, g, b = a[..., 0], a[..., 1], a[..., 2]
    y = ((66 * r + 129 * g + 25 * b + 128) >> 8) + 16
    u = ((-38 * r - 74 * g + 112 * b + 128) >> 8) + 128
    v = ((112 * r - 94 * g - 18 * b + 128) >> 8) + 128
    h, w = y.shape
    # pad to even before 2x2 box averaging
    ue = np.pad(u, ((0, h & 1), (0, w & 1)), mode="edge")
    ve = np.pad(v, ((0, h & 1), (0, w & 1)), mode="edge")
    u4 = (
        ue[0::2, 0::2] + ue[0::2, 1::2] + ue[1::2, 0::2] + ue[1::2, 1::2] + 2
    ) >> 2
    v4 = (
        ve[0::2, 0::2] + ve[0::2, 1::2] + ve[1::2, 0::2] + ve[1::2, 1::2] + 2
    ) >> 2
    clip = lambda p: np.clip(p, 0, 255).astype(np.int64)
    return clip(y), clip(u4), clip(v4)


def _pad_to(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def _quantize_block(coeffs: np.ndarray, qdc: int, qac: int, first: int) -> np.ndarray:
    """Nearest-round quantized levels in ZIGZAG order (16,), clamped to
    the token alphabet's maximum (CAT6 base + 11 extra bits)."""
    out = np.zeros(16, dtype=np.int64)
    flat = coeffs.flatten()
    for i in range(first, 16):
        c = int(flat[_ZIG[i]])
        q = qdc if i == 0 else qac
        v = int(np.rint(c / q))
        lim = CAT_BASE[5] + (1 << 11) - 1
        out[i] = max(-lim, min(lim, v))
    return out


def _dequant_block(levels: np.ndarray, qdc: int, qac: int, first: int) -> np.ndarray:
    co = np.zeros(16, dtype=np.int64)
    for i in range(first, 16):
        co[_ZIG[i]] = levels[i] * (qdc if i == 0 else qac)
    return co.reshape(4, 4)


def _encode_block_coeffs(be: BoolEncoder, probs, plane, ctx, first, levels):
    """Mirror of _decode_block_coeffs: emit the token stream for one
    block's ZIGZAG-order levels; returns the nz flag (context value)."""
    p_all = probs[plane]
    last = -1
    for i in range(first, 16):
        if levels[i]:
            last = i
    skip_eob = False
    i = first
    while i <= (last if last >= 0 else first - 1):
        p = p_all[COEFF_BANDS[i]][ctx]
        if not skip_eob:
            be.put(int(p[0]), 1)  # not EOB
        v = int(levels[i])
        if v == 0:
            be.put(int(p[1]), 0)
            ctx = 0
            skip_eob = True
            i += 1
            continue
        skip_eob = False
        be.put(int(p[1]), 1)
        a = abs(v)
        if a == 1:
            be.put(int(p[2]), 0)
            ctx = 1
        else:
            ctx = 2
            be.put(int(p[2]), 1)
            if a <= 4:
                be.put(int(p[3]), 0)
                if a == 2:
                    be.put(int(p[4]), 0)
                else:
                    be.put(int(p[4]), 1)
                    be.put(int(p[5]), a - 3)
            else:
                be.put(int(p[3]), 1)
                cat = 5
                for c in range(5):
                    if a < CAT_BASE[c + 1]:
                        cat = c
                        break
                if cat == 0:
                    be.put(int(p[6]), 0)
                    be.put(int(p[7]), 0)
                elif cat == 1:
                    be.put(int(p[6]), 0)
                    be.put(int(p[7]), 1)
                elif cat == 2:
                    be.put(int(p[6]), 1)
                    be.put(int(p[8]), 0)
                    be.put(int(p[9]), 0)
                elif cat == 3:
                    be.put(int(p[6]), 1)
                    be.put(int(p[8]), 0)
                    be.put(int(p[9]), 1)
                elif cat == 4:
                    be.put(int(p[6]), 1)
                    be.put(int(p[8]), 1)
                    be.put(int(p[10]), 0)
                else:
                    be.put(int(p[6]), 1)
                    be.put(int(p[8]), 1)
                    be.put(int(p[10]), 1)
                extra = a - CAT_BASE[cat]
                cps = CAT_PROBS[cat]
                for k, cp in enumerate(cps):
                    be.put(cp, (extra >> (len(cps) - 1 - k)) & 1)
        be.put(128, 1 if v < 0 else 0)
        i += 1
    if last < 15:
        # EOB is legal here: it always follows a nonzero token (or opens
        # the block), never a zero token
        i_eob = last + 1 if last >= 0 else first
        p = p_all[COEFF_BANDS[i_eob]][ctx]
        be.put(int(p[0]), 0)
    return 1 if last >= 0 else 0


def _sad(a: np.ndarray, b: np.ndarray) -> int:
    return int(np.abs(a - b).sum())


def quality_to_qi(quality: float) -> int:
    """Map a 0-100 quality to a VP8 quantizer index (0 = best)."""
    return max(0, min(127, int(round(127 - quality * 1.2))))


def encode_image_webp(arr: np.ndarray, quality: float = 75.0) -> bytes:
    """Encode HxWx3 uint8 RGB as a lossy WebP (VP8 keyframe in a RIFF
    container). Spec-valid output: decodes in libwebp bit-exactly to
    this encoder's own in-loop reconstruction (loop filter level 0)."""
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    H0, W0 = arr.shape[:2]
    if H0 == 0 or W0 == 0 or H0 >= (1 << 14) or W0 >= (1 << 14):
        raise ValueError(f"unsupported WebP dimensions {W0}x{H0}")
    qi = quality_to_qi(quality)
    y, u, v = _rgb_to_yuv420(arr)
    mb_w, mb_h = (W0 + 15) >> 4, (H0 + 15) >> 4
    W, H = mb_w * 16, mb_h * 16
    Y = _pad_to(y, H, W)
    U = _pad_to(u, H >> 1, W >> 1)
    V = _pad_to(v, H >> 1, W >> 1)
    RY = np.zeros((H, W), dtype=np.int64)
    RU = np.zeros((H >> 1, W >> 1), dtype=np.int64)
    RV = np.zeros((H >> 1, W >> 1), dtype=np.int64)
    q = quant_factors(qi, {})
    probs = COEFF_PROBS0

    mode_bits = []  # (ymode, uvmode, skip) per MB
    be_tok = BoolEncoder()
    above_y = np.zeros((mb_w, 4), dtype=np.int64)
    above_u = np.zeros((mb_w, 2), dtype=np.int64)
    above_v = np.zeros((mb_w, 2), dtype=np.int64)
    above_y2 = np.zeros(mb_w, dtype=np.int64)
    # the skip flag is decided from the quantized levels BEFORE token
    # emission, so skipped MBs simply emit no tokens (partition 2) while
    # their mode bits still go to partition 1
    for my in range(mb_h):
        left_y = np.zeros(4, dtype=np.int64)
        left_u = np.zeros(2, dtype=np.int64)
        left_v = np.zeros(2, dtype=np.int64)
        left_y2 = 0
        for mx in range(mb_w):
            x0, y0 = mx * 16, my * 16
            cx0, cy0 = mx * 8, my * 8
            have_a, have_l = my > 0, mx > 0
            src = Y[y0 : y0 + 16, x0 : x0 + 16]

            above = (
                RY[y0 - 1, x0 : x0 + 16]
                if have_a
                else np.full(16, 127, dtype=np.int64)
            )
            left = (
                RY[y0 : y0 + 16, x0 - 1]
                if have_l
                else np.full(16, 129, dtype=np.int64)
            )
            al = (
                RY[y0 - 1, x0 - 1]
                if (have_a and have_l)
                else (129 if have_a else 127)
            )
            cands = {DC_PRED: _pred16_dc(above, left, have_a, have_l)}
            for m in (V_PRED, H_PRED, TM_PRED):
                cands[m] = _pred_block(m, 16, above, left, int(al))
            ymode = min(cands, key=lambda m: _sad(cands[m], src))
            pred = cands[ymode]
            res = src - pred

            # transform: 16 fdcts, DCs through the WHT (all MBs have Y2)
            blocks = []
            dcs = np.zeros((4, 4), dtype=np.int64)
            for sy in range(4):
                for sx in range(4):
                    co = fdct4x4(res[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4])
                    dcs[sy, sx] = co[0, 0]
                    blocks.append(co.astype(np.int64))
            y2_levels = _quantize_block(
                fwht4x4(dcs).astype(np.int64), q["y2"][0], q["y2"][1], 0
            )
            y2_deq = _dequant_block(y2_levels, q["y2"][0], q["y2"][1], 0)
            y2_out = iwht4x4(y2_deq)
            ylevels = [
                _quantize_block(b, q["y1"][0], q["y1"][1], 1) for b in blocks
            ]

            # chroma
            def chroma_mb(plane, rec):
                csrc = plane[cy0 : cy0 + 8, cx0 : cx0 + 8]
                cab = (
                    rec[cy0 - 1, cx0 : cx0 + 8]
                    if have_a
                    else np.full(8, 127, dtype=np.int64)
                )
                clf = (
                    rec[cy0 : cy0 + 8, cx0 - 1]
                    if have_l
                    else np.full(8, 129, dtype=np.int64)
                )
                cal = (
                    rec[cy0 - 1, cx0 - 1]
                    if (have_a and have_l)
                    else (129 if have_a else 127)
                )
                return csrc, cab, clf, int(cal)

            usrc, uab, ulf, ual = chroma_mb(U, RU)
            vsrc, vab, vlf, val = chroma_mb(V, RV)
            ucands = {DC_PRED: _pred8_dc(uab, ulf, have_a, have_l)}
            vcands = {DC_PRED: _pred8_dc(vab, vlf, have_a, have_l)}
            for m in (V_PRED, H_PRED, TM_PRED):
                ucands[m] = _pred_block(m, 8, uab, ulf, ual)
                vcands[m] = _pred_block(m, 8, vab, vlf, val)
            uvmode = min(
                ucands,
                key=lambda m: _sad(ucands[m], usrc) + _sad(vcands[m], vsrc),
            )
            upred, vpred = ucands[uvmode], vcands[uvmode]
            ulevels, vlevels = [], []
            for csrc, cpred, store in (
                (usrc, upred, ulevels),
                (vsrc, vpred, vlevels),
            ):
                cres = csrc - cpred
                for sy in range(2):
                    for sx in range(2):
                        co = fdct4x4(
                            cres[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4]
                        )
                        store.append(
                            _quantize_block(co, q["uv"][0], q["uv"][1], 0)
                        )

            skip = (
                not y2_out.any()
                and not any(l.any() for l in ylevels)
                and not any(l.any() for l in ulevels)
                and not any(l.any() for l in vlevels)
                # a nonzero y2 token stream must be sent even if the DCs
                # inverse-transform to zero: skip drops the tokens
                and not y2_levels.any()
            )
            mode_bits.append((ymode, uvmode, skip))

            # reconstruct (exactly as the decoder will)
            yblk = pred.copy()
            for sy in range(4):
                for sx in range(4):
                    deq = _dequant_block(
                        ylevels[sy * 4 + sx], q["y1"][0], q["y1"][1], 1
                    )
                    deq[0, 0] = y2_out[sy, sx]
                    yblk[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] += idct4x4(
                        deq
                    )
            RY[y0 : y0 + 16, x0 : x0 + 16] = np.clip(yblk, 0, 255)
            for pred_c, levels_c, rec in (
                (upred, ulevels, RU),
                (vpred, vlevels, RV),
            ):
                cblk = pred_c.copy()
                for sy in range(2):
                    for sx in range(2):
                        deq = _dequant_block(
                            levels_c[sy * 2 + sx], q["uv"][0], q["uv"][1], 0
                        )
                        cblk[sy * 4 : sy * 4 + 4, sx * 4 : sx * 4 + 4] += (
                            idct4x4(deq)
                        )
                rec[cy0 : cy0 + 8, cx0 : cx0 + 8] = np.clip(cblk, 0, 255)

            # token emission with decoder-mirrored contexts
            if skip:
                left_y[:] = 0
                left_u[:] = 0
                left_v[:] = 0
                above_y[mx, :] = 0
                above_u[mx, :] = 0
                above_v[mx, :] = 0
                left_y2 = 0
                above_y2[mx] = 0
            else:
                ctx = int(above_y2[mx] + left_y2)
                nz2 = _encode_block_coeffs(be_tok, probs, 1, ctx, 0, y2_levels)
                above_y2[mx] = left_y2 = nz2
                for sy in range(4):
                    for sx in range(4):
                        ctx = int(above_y[mx, sx] + left_y[sy])
                        nzb = _encode_block_coeffs(
                            be_tok, probs, 0, ctx, 1, ylevels[sy * 4 + sx]
                        )
                        above_y[mx, sx] = left_y[sy] = nzb
                for levels_c, above_c, left_c in (
                    (ulevels, above_u, left_u),
                    (vlevels, above_v, left_v),
                ):
                    for sy in range(2):
                        for sx in range(2):
                            ctx = int(above_c[mx, sx] + left_c[sy])
                            nzb = _encode_block_coeffs(
                                be_tok, probs, 2, ctx, 0,
                                levels_c[sy * 2 + sx],
                            )
                            above_c[mx, sx] = left_c[sy] = nzb

    # ---- partition 1: frame header + per-MB modes ----
    be = BoolEncoder()
    be.flag(0)  # color space
    be.flag(0)  # clamping
    be.flag(0)  # segmentation disabled
    be.flag(0)  # filter type (ignored at level 0, write simple)
    be.literal(6, 0)  # filter level 0: no loop filtering
    be.literal(3, 0)  # sharpness
    be.flag(0)  # lf_delta disabled
    be.literal(2, 0)  # log2(token partitions) = 0 -> 1 partition
    be.literal(7, qi)
    for _ in range(5):
        be.flag(0)  # no quantizer deltas
    be.flag(1)  # refresh entropy probs (moot for a still)
    up = COEFF_UPDATE_PROBS
    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    be.put(int(up[t, b, c, p]), 0)  # keep default probs
    be.flag(1)  # mb_no_skip_coeff: transmit per-MB skip flags
    be.literal(8, 128)  # P(skip) = 128
    for ymode, uvmode, skip in mode_bits:
        be.flag(1 if skip else 0)
        be.tree(KF_YMODE_TREE, KF_YMODE_PROBS, ymode)
        be.tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvmode)
    part1 = be.finish()
    part2 = be_tok.finish()

    tag = (len(part1) << 5) | (1 << 4) | 0  # keyframe, version 0, shown
    frame = (
        bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
        + b"\x9d\x01\x2a"
        + struct.pack("<HH", W0, H0)
        + part1
        + part2
    )
    chunk = b"VP8 " + struct.pack("<I", len(frame)) + frame
    if len(frame) & 1:
        chunk += b"\x00"
    riff = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    return riff



# ---------------------------------------------------------------------------
# ALPH chunk (alpha plane for lossy frames), RGBA stills, animation
# ---------------------------------------------------------------------------
#
# Container spec layout. ALPH header byte (MSB->LSB): reserved(2),
# preprocessing(2), filtering(2), compression(2). Compression 0 = raw
# bytes, 1 = a header-less VP8L image stream whose green channel is the
# plane (functions/vp8l.py decodes it). Filters predict each pixel from
# already-decoded neighbors; the first pixel of a row predicts from the
# pixel above it, the first row from the left.


def _alpha_unfilter(plane: np.ndarray, method: int) -> np.ndarray:
    h, w = plane.shape
    if method == 0:
        return plane
    out = plane.astype(np.int64)
    if method == 1:  # horizontal
        for y in range(h):
            pred = out[y - 1, 0] if y else 0
            for x in range(w):
                pred = (pred + out[y, x]) & 0xFF
                out[y, x] = pred
    elif method == 2:  # vertical (first row horizontal from 0)
        pred = 0
        for x in range(w):
            pred = (pred + out[0, x]) & 0xFF
            out[0, x] = pred
        for y in range(1, h):
            out[y] = (out[y] + out[y - 1]) & 0xFF
    elif method == 3:  # gradient
        pred = 0
        for x in range(w):
            pred = (pred + out[0, x]) & 0xFF
            out[0, x] = pred
        for y in range(1, h):
            left = out[y - 1, 0]
            top_left = left
            for x in range(w):
                top = out[y - 1, x]
                g = left + top - top_left
                g = 0 if g < 0 else (255 if g > 255 else g)
                left = (out[y, x] + g) & 0xFF
                top_left = top
                out[y, x] = left
    else:
        raise ValueError(f"ALPH: bad filter method {method}")
    return out.astype(np.uint8)


def decode_alph_chunk(body: bytes, w: int, h: int) -> np.ndarray:
    """ALPH payload -> (h, w) uint8 alpha plane."""
    if not body:
        raise ValueError("ALPH: empty chunk")
    hdr = body[0]
    comp = hdr & 0x3
    filt = (hdr >> 2) & 0x3
    pre = (hdr >> 4) & 0x3
    if pre not in (0, 1):
        raise ValueError(f"ALPH: bad preprocessing {pre}")
    # pre == 1 (level reduction) needs no inverse; libwebp optionally
    # smooths the quantized plane, a decoder-side cosmetic we skip
    if comp == 0:
        raw = np.frombuffer(body, dtype=np.uint8, count=w * h, offset=1)
        plane = raw.reshape(h, w).copy()
    elif comp == 1:
        from .vp8l import decode_vp8l_alpha

        plane = decode_vp8l_alpha(body[1:], w, h)
    else:
        raise ValueError(f"ALPH: bad compression method {comp}")
    return _alpha_unfilter(plane, filt)


def _walk_chunks(content: bytes):
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) payload")
    pos = 12
    end = min(len(content), 8 + struct.unpack("<I", content[4:8])[0])
    while pos + 8 <= end:
        fourcc = content[pos : pos + 4]
        size = struct.unpack("<I", content[pos + 4 : pos + 8])[0]
        yield fourcc, content[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def _decode_still_rgba(chunks) -> np.ndarray:
    """Compose ALPH + VP8 / VP8L chunks into HxWx4 RGBA."""
    alph = None
    for fourcc, body in chunks:
        if fourcc == b"ALPH":
            alph = body
        elif fourcc == b"VP8L":
            from .vp8l import decode_vp8l_argb

            argb, w, h = decode_vp8l_argb(body)
            a = (argb >> 24).astype(np.uint8)
            r = ((argb >> 16) & 0xFF).astype(np.uint8)
            g = ((argb >> 8) & 0xFF).astype(np.uint8)
            b = (argb & 0xFF).astype(np.uint8)
            return np.stack([r, g, b, a], axis=-1).reshape(h, w, 4)
        elif fourcc == b"VP8 ":
            Y, U, V, _h = _decode_webp_vp8_frame(body)
            rgb = _yuv420_to_rgb(Y, U, V)
            h, w = rgb.shape[:2]
            if alph is not None:
                alpha = decode_alph_chunk(alph, w, h)
            else:
                alpha = np.full((h, w), 255, np.uint8)
            return np.dstack([rgb, alpha])
    raise ValueError("WebP payload has no image chunk")


def decode_webp_rgba(content: bytes) -> np.ndarray:
    """Still WebP (lossy incl. ALPH alpha plane, or lossless) ->
    HxWx4 uint8 RGBA."""
    return _decode_still_rgba(list(_walk_chunks(content)))


# --- animation (VP8X/ANIM/ANMF) ---------------------------------------------


def _sub_chunks(body: bytes):
    pos = 0
    while pos + 8 <= len(body):
        fourcc = body[pos : pos + 4]
        size = struct.unpack("<I", body[pos + 4 : pos + 8])[0]
        yield fourcc, body[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def decode_webp_animation(content: bytes):
    """Animated WebP -> (frames uint8 [n, ch, cw, 4], durations_ms).

    Compositing per the container spec: canvas starts fully transparent;
    each ANMF frame either overwrites its rect (blend bit set = no
    blend) or alpha-blends onto it (straight, non-premultiplied); the
    dispose-to-background method clears the frame's rect to transparent
    before the NEXT frame. Frame x/y offsets are stored halved."""
    canvas_w = canvas_h = None
    frames = []
    durations = []
    canvas = None
    for fourcc, body in _walk_chunks(content):
        if fourcc == b"VP8X":
            canvas_w = 1 + int.from_bytes(body[4:7], "little")
            canvas_h = 1 + int.from_bytes(body[7:10], "little")
            canvas = np.zeros((canvas_h, canvas_w, 4), np.uint8)
        elif fourcc == b"ANMF":
            if canvas is None:
                raise ValueError("ANMF before VP8X in animated WebP")
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            no_blend = bool(flags & 0x02)
            dispose_bg = bool(flags & 0x01)
            rgba = _decode_still_rgba(list(_sub_chunks(body[16:])))
            if rgba.shape[:2] != (fh, fw):
                raise ValueError(
                    f"ANMF frame decodes to {rgba.shape[:2]}, header says "
                    f"({fh}, {fw})"
                )
            region = canvas[fy : fy + fh, fx : fx + fw]
            if no_blend:
                region[:] = rgba
            else:
                sa = rgba[..., 3:4].astype(np.int64)
                da = region[..., 3:4].astype(np.int64)
                oa = sa + da * (255 - sa) // 255
                num = (
                    rgba[..., :3].astype(np.int64) * sa
                    + region[..., :3].astype(np.int64) * da * (255 - sa) // 255
                )
                safe = np.maximum(oa, 1)
                region[..., :3] = (num // safe).astype(np.uint8)
                region[..., 3:4] = oa.astype(np.uint8)
            frames.append(canvas.copy())
            durations.append(dur)
            if dispose_bg:
                canvas[fy : fy + fh, fx : fx + fw] = 0
        # VP8 /VP8L at top level would be a still; ignore here
    if not frames:
        raise ValueError("WebP container has no ANMF frames")
    return np.stack(frames), durations


def encode_webp_animation(
    frames,
    durations,
    quality: float = 90.0,
    offsets=None,
    no_blend=None,
    dispose_bg=None,
    loop_count: int = 0,
) -> bytes:
    """Mux an animated WebP from RGB(A) frames: VP8X + ANIM + one ANMF
    per frame. Frames are encoded lossy (functions/vp8.py); an alpha
    channel, if present, rides as a RAW-compression ALPH chunk. Frames
    may be smaller than the canvas via ``offsets`` [(x, y), ...] (even
    values, per the halved storage); canvas = frame 0's bounding size
    unless offsets demand more."""
    n = len(frames)
    offsets = offsets or [(0, 0)] * n
    no_blend = no_blend if no_blend is not None else [True] * n
    dispose_bg = dispose_bg if dispose_bg is not None else [False] * n
    cw = max(o[0] + f.shape[1] for o, f in zip(offsets, frames))
    ch = max(o[1] + f.shape[0] for o, f in zip(offsets, frames))

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return (
            fourcc + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b"")
        )

    out = bytearray()
    # VP8X: flag bit 1 = animation (byte0 bit 0x02), alpha bit 0x10
    has_alpha = any(f.shape[-1] == 4 for f in frames)
    flags = 0x02 | (0x10 if has_alpha else 0)
    vp8x = bytes([flags, 0, 0, 0]) + (cw - 1).to_bytes(3, "little") + (
        ch - 1
    ).to_bytes(3, "little")
    out += chunk(b"VP8X", vp8x)
    out += chunk(b"ANIM", struct.pack("<IH", 0xFFFFFFFF, loop_count))
    for f, (x, y), dur, nb, db in zip(
        frames, offsets, durations, no_blend, dispose_bg
    ):
        if x & 1 or y & 1:
            raise ValueError("ANMF offsets must be even (stored halved)")
        fh, fw = f.shape[:2]
        rgb = f[..., :3]
        payload = bytearray()
        if f.shape[-1] == 4:
            alph = bytes([0]) + np.ascontiguousarray(f[..., 3]).tobytes()
            payload += chunk(b"ALPH", alph)
        still = encode_image_webp(rgb, quality)
        for fourcc, body in _walk_chunks(still):
            if fourcc == b"VP8 ":
                payload += chunk(b"VP8 ", body)
                break
        head = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(dur).to_bytes(3, "little")
            + bytes([(0x02 if nb else 0) | (0x01 if db else 0)])
        )
        out += chunk(b"ANMF", bytes(head) + bytes(payload))
    riff = b"RIFF" + struct.pack("<I", 4 + len(out)) + b"WEBP" + bytes(out)
    return riff
