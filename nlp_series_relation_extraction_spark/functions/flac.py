"""FLAC codec (pure Python/numpy) — lossless compressed audio decode/encode.

Public spec: RFC 9639 / the xiph.org FLAC format document. This is the
audio counterpart of the image modules: web-crawl audio arrives FLAC/MP3/
OGG far more often than WAV, and FLAC is the losslessly-verifiable one —
decode must reproduce the source samples BIT-EXACTLY, so every test is an
exact-equality pin (no perceptual tolerance anywhere).

Decoder: full subset-independent — CONSTANT/VERBATIM/FIXED(0-4)/LPC
subframes, all four channel assignments (independent, left/side,
right/side, mid/side), Rice and Rice2 residual partitions including
escaped (raw-bits) partitions, wasted-bits shifts, UTF-8 frame numbers,
CRC-8 header and CRC-16 frame verification, STREAMINFO MD5 verification
of the decoded stream.

Encoder: 16-bit mono/stereo, fixed predictors with per-subframe best-order
selection (orders 0-2), CONSTANT short-circuit, Rice parameter estimation,
single-partition residual (partition order 0), correct CRCs and MD5 — a
real (if unoptimized) encoder whose output any conforming decoder accepts;
optional knobs exist solely so tests can force the decoder's corner paths
(mid/side, escape partitions, wasted bits, higher partition orders).

Testing strategy without a system libFLAC (none in this container): the
LZW lesson (PLANS.md round-5) says self-consistent roundtrips are not
enough — so beyond exact roundtrips the tests pin hand-computed spec
vectors byte-for-byte: Rice codings worked out on paper, the CRC-8/CRC-16
of known byte strings against the spec polynomials, UTF-8 frame-number
boundaries, and header fields at spec bit offsets.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

FLAC_MAGIC = b"fLaC"

# fixed-predictor residual: res[i] = x[i] - sum(coef * x[i-k]) per order
_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ---------------------------------------------------------------------------
# CRCs (spec polynomials)
# ---------------------------------------------------------------------------


def _crc_table(poly: int, width: int) -> list[int]:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = []
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if r & top else (r << 1)
        tbl.append(r & mask)
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)       # x^8 + x^2 + x + 1
_CRC16_TBL = _crc_table(0x8005, 16)   # x^16 + x^15 + x^2 + 1


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8_TBL[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = ((r << 8) & 0xFFFF) ^ _CRC16_TBL[((r >> 8) ^ b) & 0xFF]
    return r


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)

    # -- vectorized bulk writers (the per-sample hot paths) ------------

    def _append_bit_array(self, bits: "np.ndarray") -> None:
        """Append a uint8 0/1 array, preserving current sub-byte state."""
        if self.nbits:
            head = np.array(
                [(self.acc >> (self.nbits - 1 - i)) & 1
                 for i in range(self.nbits)],
                dtype=np.uint8,
            )
            bits = np.concatenate([head, bits])
        n_full = (len(bits) >> 3) << 3
        self.out += np.packbits(bits[:n_full]).tobytes()
        tail = bits[n_full:]
        self.acc = 0
        self.nbits = len(tail)
        for b in tail:
            self.acc = (self.acc << 1) | int(b)

    def write_rice_array(self, u: "np.ndarray", p: int) -> None:
        """Rice-code unsigned values: q zeros, a 1, p remainder bits each."""
        u = u.astype(np.int64)
        q = u >> p
        lens = q + 1 + p
        ends = np.cumsum(lens)
        starts = ends - lens
        bits = np.zeros(int(ends[-1]) if len(u) else 0, dtype=np.uint8)
        bits[starts + q] = 1
        if p:
            rem_pos = (ends - p)[:, None] + np.arange(p)[None, :]
            rem = (u[:, None] >> np.arange(p - 1, -1, -1)[None, :]) & 1
            bits[rem_pos.ravel()] = rem.ravel().astype(np.uint8)
        self._append_bit_array(bits)

    def write_fixed_array(self, vals: "np.ndarray", width: int) -> None:
        """Two's-complement fixed-width values, MSB first."""
        v = vals.astype(np.int64) & ((1 << width) - 1)
        bits = ((v[:, None] >> np.arange(width - 1, -1, -1)[None, :]) & 1)
        self._append_bit_array(bits.ravel().astype(np.uint8))


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.byte = pos
        self.bit = 0
        self._padded = None

    def _pad(self) -> bytes:
        if self._padded is None:
            self._padded = self.data + b"\x00" * 16
        return self._padded

    def read_rice_block(self, n: int, param: int) -> "np.ndarray":
        """Read n Rice codes (unsigned) — the residual hot loop.

        Pure-int byte windows: unary runs scan a 64-bit window (one slice
        + from_bytes per code for realistic rice params), remainders read
        through a 48-bit window. No whole-file bit unpacking — this
        machine's numpy is measured ~10x slower than spec at large
        nonzero()/astype(), so index-building approaches lose badly.
        """
        data = self._pad()
        bit_len = len(self.data) << 3
        pos = (self.byte << 3) | self.bit
        out = np.empty(n, dtype=np.int64)
        mask = (1 << param) - 1
        shift_base = 48 - param
        for i in range(n):
            # unary quotient: scan for the next set bit at/after pos
            scan = pos
            if scan >= bit_len:
                raise ValueError("invalid FLAC: bitstream truncated")
            avail = 64 - (scan & 7)
            w = int.from_bytes(
                data[scan >> 3 : (scan >> 3) + 8], "big"
            ) & ((1 << avail) - 1)
            while w == 0:
                scan += avail  # now byte-aligned; stays aligned after
                if scan >= bit_len:
                    raise ValueError("invalid FLAC: bitstream truncated")
                avail = 64
                w = int.from_bytes(data[scan >> 3 : (scan >> 3) + 8], "big")
            one_pos = scan + (avail - w.bit_length())
            q = one_pos - pos
            rstart = one_pos + 1
            if param:
                rwin = int.from_bytes(
                    data[rstart >> 3 : (rstart >> 3) + 6], "big"
                )
                rem = (rwin >> (shift_base - (rstart & 7))) & mask
            else:
                rem = 0
            out[i] = (q << param) | rem
            pos = rstart + param
        if pos > bit_len:
            raise ValueError("invalid FLAC: bitstream truncated")
        self.byte, self.bit = pos >> 3, pos & 7
        return out

    def read_fixed_block(self, n: int, width: int) -> "np.ndarray":
        """Read n two's-complement width-bit values — region-local
        unpack (only the n*width bits needed, never the whole file)."""
        if width == 0:
            return np.zeros(n, dtype=np.int64)
        pos = (self.byte << 3) | self.bit
        end = pos + n * width
        if end > (len(self.data) << 3):
            raise ValueError("invalid FLAC: bitstream truncated")
        first = pos >> 3
        last = (end + 7) >> 3
        region = np.unpackbits(
            np.frombuffer(self.data[first:last], dtype=np.uint8)
        )
        off = pos & 7
        chunk = region[off : off + n * width].reshape(n, width)
        w = 1 << np.arange(width - 1, -1, -1, dtype=np.int64)
        v = chunk.astype(np.int64) @ w
        v -= (v >= (1 << (width - 1))).astype(np.int64) << width
        self.byte, self.bit = end >> 3, end & 7
        return v

    def read(self, bits: int) -> int:
        v = 0
        while bits > 0:
            if self.byte >= len(self.data):
                raise ValueError("invalid FLAC: bitstream truncated")
            avail = 8 - self.bit
            take = min(bits, avail)
            cur = self.data[self.byte]
            v = (v << take) | ((cur >> (avail - take)) & ((1 << take) - 1))
            self.bit += take
            bits -= take
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v & (1 << (bits - 1)):
            v -= 1 << bits
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _zigzag(x: np.ndarray) -> np.ndarray:
    """signed -> unsigned per the spec: positive n -> 2n, negative n -> -2n-1."""
    x = x.astype(np.int64)
    return np.where(x >= 0, x << 1, ((-x) << 1) - 1)


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_number(n: int) -> bytes:
    """The spec's extended-UTF-8 coded number (frame/sample index)."""
    if n < 0x80:
        return bytes([n])
    # a k-byte form carries (7-k) + 6*(k-1) payload bits (k<=6), 36 for k=7
    for k in range(2, 8):
        cap = (7 - k) + 6 * (k - 1) if k <= 6 else 36
        if n < (1 << cap):
            nbytes = k
            break
    rest = [(0x80 | ((n >> (6 * i)) & 0x3F)) for i in range(nbytes - 1)]
    lead_payload = n >> (6 * (nbytes - 1))
    lead = ((0xFF << (8 - nbytes)) & 0xFF) | lead_payload
    if nbytes == 7:
        lead = 0xFE
    return bytes([lead] + list(reversed(rest)))


def _read_utf8_number(br: _BitReader) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n_follow = 0
    probe = b0
    while probe & 0x40:
        n_follow += 1
        probe <<= 1
    if n_follow == 0:
        raise ValueError("invalid FLAC: bad UTF-8 frame number lead byte")
    v = b0 & (0x7F >> (n_follow + 1)) if n_follow < 6 else 0
    for _ in range(n_follow):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("invalid FLAC: bad UTF-8 continuation byte")
        v = (v << 6) | (b & 0x3F)
    return v


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

_BLOCKSIZE_CODES = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5,
                    256: 8, 512: 9, 1024: 10, 2048: 11, 4096: 12,
                    8192: 13, 16384: 14, 32768: 15}
_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}


def _best_fixed_order(x: np.ndarray, max_order: int = 2) -> int:
    best, best_cost = 0, None
    for k in range(0, max_order + 1):
        if len(x) <= k:
            break
        r = x.astype(np.int64)
        for _ in range(k):
            r = np.diff(r)
        cost = int(np.abs(r).sum())
        if best_cost is None or cost < best_cost:
            best, best_cost = k, cost
    return best


def _rice_param(res: np.ndarray, max_param: int = 14) -> int:
    if len(res) == 0:
        return 0
    mean = float(np.mean(np.abs(res.astype(np.int64))))
    p = 0
    while (1 << p) < mean + 1 and p < max_param:
        p += 1
    return p


def _write_rice_partition(
    bw: _BitWriter, res: np.ndarray, param: int, escape_raw_bits: int | None
) -> None:
    if escape_raw_bits is not None:
        bw.write(0xF, 4)  # escape code
        bw.write(escape_raw_bits, 5)
        bw.write_fixed_array(res.astype(np.int64), escape_raw_bits)
        return
    bw.write(param, 4)
    bw.write_rice_array(_zigzag(res), param)


def _encode_subframe(
    bw: _BitWriter,
    x: np.ndarray,
    bps: int,
    force_verbatim: bool = False,
    force_escape: bool = False,
    partition_order: int = 0,
    wasted_ok: bool = True,
) -> None:
    x = x.astype(np.int64)
    n = len(x)
    if not force_verbatim and n and np.all(x == x[0]):
        bw.write(0, 1)           # pad
        bw.write(0, 6)           # CONSTANT
        bw.write(0, 1)           # no wasted bits
        bw.write(int(x[0]) & ((1 << bps) - 1), bps)
        return
    # wasted bits: common trailing-zero shift across the block
    wasted = 0
    if wasted_ok and n and np.any(x != 0):
        ors = int(np.bitwise_or.reduce(x))
        while wasted < bps - 1 and (ors >> wasted) & 1 == 0:
            wasted += 1
    xs = x >> wasted
    eff_bps = bps - wasted
    if force_verbatim:
        bw.write(0, 1)
        bw.write(1, 6)           # VERBATIM
        self_wasted = wasted
        if self_wasted:
            bw.write(1, 1)
            bw.write_unary(self_wasted - 1)
        else:
            bw.write(0, 1)
        bw.write_fixed_array(xs, eff_bps)
        return
    order = _best_fixed_order(xs)
    if n <= order:
        order = 0
    bw.write(0, 1)
    bw.write(8 + order, 6)       # FIXED, order
    if wasted:
        bw.write(1, 1)
        bw.write_unary(wasted - 1)
    else:
        bw.write(0, 1)
    for v in xs[:order]:         # warmup
        bw.write(int(v) & ((1 << eff_bps) - 1), eff_bps)
    res = xs
    for _ in range(order):
        res = np.diff(res)
    # residual: method 0 (4-bit rice), chosen partition order
    bw.write(0, 2)
    p = partition_order
    while p > 0 and (n % (1 << p) != 0 or (n >> p) <= order):
        p -= 1
    bw.write(p, 4)
    n_parts = 1 << p
    part_len = n >> p
    start = 0
    for i in range(n_parts):
        ln = part_len - (order if i == 0 else 0)
        chunk = res[start : start + ln]
        start += ln
        if force_escape:
            # two's-complement width that holds every residual
            raw_bits = max(
                (
                    (int(v).bit_length() + 1) if int(v) >= 0
                    else ((-int(v) - 1).bit_length() + 1)
                    for v in chunk
                ),
                default=1,
            )
            raw_bits = max(raw_bits, 1)
            _write_rice_partition(bw, chunk, 0, raw_bits)
        else:
            _write_rice_partition(bw, chunk, _rice_param(chunk), None)


def encode_audio_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 1024,
    mid_side: bool = False,
    force_verbatim: bool = False,
    force_escape: bool = False,
    partition_order: int = 0,
) -> bytes:
    """int16 samples shaped [n] or [n, ch] (1-2 channels) -> FLAC bytes.

    Knobs beyond defaults exist to force decoder corner paths in tests:
    ``mid_side`` (stereo decorrelation), ``force_verbatim``,
    ``force_escape`` (escaped raw-bits partitions), ``partition_order``.
    """
    a = np.asarray(samples, dtype=np.int16)
    if a.ndim == 1:
        a = a[:, None]
    n, ch = a.shape
    if ch not in (1, 2):
        raise ValueError("FLAC encoder: 1 or 2 channels")
    bps = 16

    md5 = hashlib.md5(a.astype("<i2").tobytes()).digest()
    if n == 0 or n >= block_size:
        min_bs = (n % block_size) or block_size if n else block_size
    else:
        min_bs = n
    streaminfo = _BitWriter()
    streaminfo.write(min_bs, 16)
    streaminfo.write(block_size if n >= block_size else max(min_bs, 1), 16)
    streaminfo.write(0, 24)  # min frame size unknown
    streaminfo.write(0, 24)  # max frame size unknown
    streaminfo.write(sample_rate, 20)
    streaminfo.write(ch - 1, 3)
    streaminfo.write(bps - 1, 5)
    streaminfo.write(n, 36)
    si = streaminfo.bytes() + md5
    assert len(si) == 34
    header = FLAC_MAGIC + bytes([0x80]) + struct.pack(">I", 34)[1:] + si

    frames = bytearray()
    frame_no = 0
    for start in range(0, max(n, 1), block_size):
        blk = a[start : start + block_size]
        bs = len(blk)
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0b11111111111110, 14)
        bw.write(0, 1)            # reserved
        bw.write(0, 1)            # fixed-blocksize strategy
        bs_code = _BLOCKSIZE_CODES.get(bs, 7)  # 7: 16-bit value-1 follows
        bw.write(bs_code, 4)
        sr_code = _RATE_CODES.get(sample_rate, 0)
        bw.write(sr_code, 4)
        if ch == 2 and mid_side:
            chan_code = 10
        else:
            chan_code = ch - 1
        bw.write(chan_code, 4)
        bw.write(0b100, 3)        # 16 bps
        bw.write(0, 1)            # reserved
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        if bs_code == 7:
            bw.write(bs - 1, 16)
        bw.align()
        partial = bytes(bw.out)
        bw.write(crc8(partial), 8)

        if ch == 2 and mid_side:
            l = blk[:, 0].astype(np.int64)
            r = blk[:, 1].astype(np.int64)
            mid = (l + r) >> 1
            side = l - r
            _encode_subframe(bw, mid, bps, force_verbatim, force_escape,
                             partition_order)
            _encode_subframe(bw, side, bps + 1, force_verbatim, force_escape,
                             partition_order)
        else:
            for c in range(ch):
                _encode_subframe(bw, blk[:, c], bps, force_verbatim,
                                 force_escape, partition_order)
        bw.align()
        body = bw.bytes()
        frames += body + struct.pack(">H", crc16(body))
        frame_no += 1

    return header + bytes(frames)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_BLOCKSIZE_BY_CODE = {v: k for k, v in _BLOCKSIZE_CODES.items()}
_RATE_BY_CODE = {v: k for k, v in _RATE_CODES.items()}
_BPS_BY_CODE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _read_residual(br: _BitReader, bs: int, order: int) -> np.ndarray:
    method = br.read(2)
    if method > 1:
        raise ValueError("invalid FLAC: reserved residual method")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    p = br.read(4)
    n_parts = 1 << p
    if bs % n_parts or (bs >> p) <= order:
        raise ValueError("invalid FLAC: bad partition order")
    out = np.empty(bs - order, dtype=np.int64)
    w = 0
    for i in range(n_parts):
        ln = (bs >> p) - (order if i == 0 else 0)
        param = br.read(plen)
        if param == escape:
            raw = br.read(5)
            out[w : w + ln] = br.read_fixed_block(ln, raw)
        else:
            u = br.read_rice_block(ln, param)
            out[w : w + ln] = np.where(
                u & 1, -((u + 1) >> 1), u >> 1
            )
        w += ln
    return out


def _decode_subframe(br: _BitReader, bs: int, bps: int) -> np.ndarray:
    if br.read(1) != 0:
        raise ValueError("invalid FLAC: subframe pad bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = 1 + br.read_unary()
    eff = bps - wasted
    if sf_type == 0:  # CONSTANT
        v = br.read_signed(eff)
        x = np.full(bs, v, dtype=np.int64)
    elif sf_type == 1:  # VERBATIM
        x = br.read_fixed_block(bs, eff)
    elif 8 <= sf_type <= 12:  # FIXED
        order = sf_type - 8
        warm = np.array(
            [br.read_signed(eff) for _ in range(order)], dtype=np.int64
        )
        res = _read_residual(br, bs, order)
        # invert diff^order by integrating `order` times (exact int64):
        # level j's seed is diff^(j-1) of the warmup's last value
        y = res
        for j in range(order, 0, -1):
            seed = np.diff(warm, j - 1)[-1] if order else 0
            y = seed + np.cumsum(y)
        x = np.concatenate([warm, y]) if order else y
    elif sf_type >= 32:  # LPC
        order = sf_type - 31
        warm = [br.read_signed(eff) for _ in range(order)]
        prec = br.read(4) + 1
        if prec == 16:
            raise ValueError("invalid FLAC: LPC precision code 15")
        shift = br.read(5)
        if shift & 0x10:
            raise ValueError("invalid FLAC: negative LPC shift")
        coefs = [br.read_signed(prec) for _ in range(order)]
        res = _read_residual(br, bs, order)
        x = np.empty(bs, dtype=np.int64)
        x[:order] = warm
        for i in range(order, bs):
            pred = 0
            for k in range(order):
                pred += coefs[k] * x[i - 1 - k]
            x[i] = res[i - order] + (pred >> shift)
    else:
        raise ValueError(f"invalid FLAC: reserved subframe type {sf_type}")
    return x << wasted


def decode_audio_flac(
    data: bytes, verify_md5: bool = True
) -> tuple[np.ndarray, int]:
    """FLAC -> (int32 samples [n, ch], sample_rate). Verifies frame CRCs
    and (for 16-bit streams, when the header carries one) the STREAMINFO
    MD5 of the decoded output."""
    data = bytes(data)
    if data[:4] != FLAC_MAGIC:
        raise ValueError("not a FLAC payload")
    pos = 4
    streaminfo = None
    while True:
        hdr = data[pos : pos + 4]
        if len(hdr) < 4:
            raise ValueError("invalid FLAC: truncated metadata")
        last = hdr[0] & 0x80
        btype = hdr[0] & 0x7F
        ln = int.from_bytes(hdr[1:4], "big")
        body = data[pos + 4 : pos + 4 + ln]
        if btype == 0:
            if ln != 34:
                raise ValueError("invalid FLAC: STREAMINFO length")
            streaminfo = body
        pos += 4 + ln
        if last:
            break
    if streaminfo is None:
        raise ValueError("invalid FLAC: no STREAMINFO")
    br = _BitReader(streaminfo)
    br.read(16)  # min blocksize
    br.read(16)  # max blocksize
    br.read(24)
    br.read(24)
    sample_rate = br.read(20)
    n_ch = br.read(3) + 1
    bps = br.read(5) + 1
    total = br.read(36)
    md5_expect = streaminfo[18:34]

    chans: list[list[np.ndarray]] = [[] for _ in range(n_ch)]
    got = 0
    br = _BitReader(data)  # ONE reader: the bit/ones index unpacks once
    while pos < len(data) and (total == 0 or got < total):
        frame_start = pos
        br.byte, br.bit = pos, 0
        sync = br.read(14)
        if sync != 0b11111111111110:
            raise ValueError("invalid FLAC: lost frame sync")
        if br.read(1):
            raise ValueError("invalid FLAC: reserved frame bit")
        br.read(1)  # blocking strategy
        bs_code = br.read(4)
        sr_code = br.read(4)
        chan_code = br.read(4)
        bps_code = br.read(3)
        if br.read(1):
            raise ValueError("invalid FLAC: reserved frame bit 2")
        _read_utf8_number(br)
        if bs_code == 0:
            raise ValueError("invalid FLAC: reserved blocksize code")
        elif bs_code == 6:
            bs = br.read(8) + 1
        elif bs_code == 7:
            bs = br.read(16) + 1
        else:
            bs = _BLOCKSIZE_BY_CODE[bs_code]
        if sr_code == 12:
            br.read(8)
        elif sr_code in (13, 14):
            br.read(16)
        fbps = _BPS_BY_CODE.get(bps_code, bps)
        hdr_end = br.byte  # header CRC is byte-aligned here
        expect = br.read(8)
        if crc8(data[frame_start:hdr_end]) != expect:
            raise ValueError("invalid FLAC: frame header CRC-8 mismatch")

        if chan_code < 8:
            n_sub = chan_code + 1
            sub_bps = [fbps] * n_sub
        elif chan_code in (8, 9, 10):
            n_sub = 2
            side_extra = {8: (0, 1), 9: (1, 0), 10: (0, 1)}[chan_code]
            sub_bps = [fbps + side_extra[0], fbps + side_extra[1]]
        else:
            raise ValueError("invalid FLAC: reserved channel assignment")
        if chan_code < 8 and n_sub != n_ch:
            raise ValueError("invalid FLAC: frame/stream channel mismatch")

        subs = [_decode_subframe(br, bs, sub_bps[i]) for i in range(n_sub)]
        br.align()
        body_end = br.byte
        (crc_expect,) = struct.unpack(">H", data[body_end : body_end + 2])
        if crc16(data[frame_start:body_end]) != crc_expect:
            raise ValueError("invalid FLAC: frame CRC-16 mismatch")
        pos = body_end + 2

        if chan_code == 8:       # left/side: side = l - r
            left, side = subs
            subs = [left, left - side]
        elif chan_code == 9:     # right/side
            side, right = subs
            subs = [side + right, right]
        elif chan_code == 10:    # mid/side
            mid, side = subs
            m2 = (mid << 1) | (side & 1)
            subs = [(m2 + side) >> 1, (m2 - side) >> 1]
        for c in range(n_ch):
            chans[c].append(subs[c])
        got += bs

    out = np.stack(
        [np.concatenate(c) if c else np.empty(0, dtype=np.int64)
         for c in chans],
        axis=1,
    )
    if total:
        out = out[:total]
    if verify_md5 and bps == 16 and md5_expect != b"\x00" * 16:
        calc = hashlib.md5(out.astype("<i2").tobytes()).digest()
        if calc != md5_expect:
            raise ValueError("invalid FLAC: STREAMINFO MD5 mismatch")
    return out.astype(np.int32), sample_rate
