"""Vendored pure-numpy baseline JPEG codec (decoder + minimal encoder).

Why this exists: the reference's image lane decodes camera JPEGs with
``cv2.imdecode`` (reference preprocess_image.py:52), but no JPEG codec is
installed in this container, so the golden-fixture parity test for the
decode path could never execute. This module implements the baseline
sequential DCT process (ITU-T T.81 / ISO 10918-1) from the public spec —
enough to decode the reference fixture
(test/data/station_id_41_20200506T094000.jpg: SOF0, 8-bit, YCbCr 4:2:0)
and any other baseline JPEG — so the REAL decode → mask → crop →
normalize chain runs end-to-end in tests.

Decoder scope (everything the baseline process requires):
- markers: SOI/APPn/COM/DQT/SOF0/SOF1/DHT/DRI/SOS/RSTn/EOI
- canonical Huffman decode per the spec's MINCODE/MAXCODE/VALPTR tables
- restart-interval handling (byte-align + DC predictor reset)
- vectorized dequantize + de-zigzag + 2-D IDCT (separable 8×8 DCT basis,
  float64, one matmul pair per component — the per-block work never
  touches the Python interpreter)
- chroma upsampling by sample replication; JFIF YCbCr→BGR (BGR channel
  order to match the ``cv2.imdecode(..., IMREAD_COLOR)`` contract the
  image lane's decoder slot expects)

Out of scope (raise ValueError): progressive (SOF2), arithmetic coding,
hierarchical, 12-bit precision. Camera/webcam output — the reference's
input domain — is overwhelmingly baseline.

Exactness: Huffman decoding, dequantization and the DC path are exact;
the float IDCT + rounding may differ from libjpeg's fixed-point islow
IDCT by ±1 LSB on some AC-heavy pixels (both are conforming decoders —
T.81 Annex K gives an accuracy band, not one canonical output). Tests
therefore assert analytic exactness on DC-only images, near-lossless
round-trips through the encoder, and a committed fingerprint of this
decoder's fixture output for cross-round determinism.

The encoder exists for tests only: baseline, 4:4:4 (no subsampling),
Annex K quantization tables scaled by an IJG-style quality factor, Annex
K "typical" Huffman tables. It lets the suite construct real JPEG bytes
from known pixel arrays without any external codec.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- tables

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# 8×8 DCT-II basis: A[k, n] = c(k)/2 * cos((2n+1)kπ/16); IDCT is Aᵀ X A.
def _dct_basis() -> np.ndarray:
    k = np.arange(8).reshape(8, 1)
    n = np.arange(8).reshape(1, 8)
    a = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
    a[0, :] *= 1.0 / np.sqrt(2.0)
    return a


_A = _dct_basis()

# Annex K.1 luminance / K.2 chrominance quantization tables (natural order)
K1_LUMA = np.array(
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
    dtype=np.int64,
)
K2_CHROMA = np.array(
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
    dtype=np.int64,
)

# Annex K.3 "typical" Huffman tables: (BITS counts[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
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
]


# ----------------------------------------------------------- huffman dec


class _HuffTable:
    """Canonical Huffman table in the spec's MINCODE/MAXCODE/VALPTR form
    (T.81 F.2.2.3): per code length L, codes are consecutive integers in
    [mincode[L], maxcode[L]] and index HUFFVAL via valptr[L]."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: list[int], vals: list[int]):
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ll in range(1, 17):
            if bits[ll - 1]:
                self.valptr[ll] = k
                self.mincode[ll] = code
                code += bits[ll - 1]
                k += bits[ll - 1]
                self.maxcode[ll] = code - 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded bytes with 0xFF00
    un-stuffing and restart-marker awareness."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2  # stuffed FF
            elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                # marker reached mid-read: the spec says a conforming
                # stream never needs these bits; feed zeros (padding)
                self.buf = (self.buf << 8) & 0xFFFFFFFF
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.buf = ((self.buf << 8) | b) & 0xFFFFFFFF
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def align_to_restart(self) -> None:
        """Discard pad bits, consume the RSTn marker."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        p = self.pos
        while d[p] != 0xFF or not (0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        self.pos = p + 2

    def decode(self, tbl: _HuffTable) -> int:
        code = self.bit()
        ll = 1
        while code > tbl.maxcode[ll]:
            code = (code << 1) | self.bit()
            ll += 1
            if ll > 16:
                raise ValueError("invalid Huffman code")
        return tbl.vals[tbl.valptr[ll] + code - tbl.mincode[ll]]


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude to its signed value."""
    return v - ((1 << s) - 1) if v < (1 << (s - 1)) else v


# --------------------------------------------------------------- decoder


def decode(data: bytes) -> np.ndarray:
    """Baseline JPEG bytes → uint8 ndarray, BGR channel order for color
    (the cv2.imdecode contract), (H, W) for grayscale."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) where comps = [(cid, hs, vs, tq)]
    i = 2
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        m = data[i + 1]
        if m == 0xD8 or m == 0x01 or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:  # EOI
            break
        seg_len = (data[i + 2] << 8) | data[i + 3]
        seg = data[i + 4 : i + 2 + seg_len]
        if m == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                qt[tq] = np.frombuffer(
                    seg[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int64)
                p += 65
        elif m in (0xC0, 0xC1):  # SOF0 / SOF1 (both baseline-huffman DCT)
            if seg[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = (seg[1] << 8) | seg[2]
            w = (seg[3] << 8) | seg[4]
            nc = seg[5]
            comps = []
            for c in range(nc):
                cid = seg[6 + c * 3]
                hv = seg[7 + c * 3]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + c * 3]))
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                   0xCE, 0xCF):
            raise ValueError(
                f"non-baseline SOF FF{m:02X} (progressive/arithmetic) "
                "unsupported"
            )
        elif m == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                (huff_ac if tc else huff_dc)[th] = _HuffTable(bits, vals)
                p += 17 + nv
        elif m == 0xDD:  # DRI
            restart_interval = (seg[0] << 8) | seg[1]
        elif m == 0xDA:  # SOS → entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []  # (comp_index, dc_table, ac_table)
            for s in range(ns):
                cs = seg[1 + s * 2]
                td, ta = seg[2 + s * 2] >> 4, seg[2 + s * 2] & 15
                ci = next(
                    idx for idx, c in enumerate(frame[2]) if c[0] == cs
                )
                scan.append((ci, huff_dc[td], huff_ac[ta]))
            return _decode_scan(
                data, i + 2 + seg_len, frame, scan, qt, restart_interval
            )
        # APPn / COM / others: skip
        i += 2 + seg_len
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan, qt, restart_interval):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # coefficient grids, one per component, shape (blocks_y, blocks_x, 64)
    grids = []
    for _, hs, vs, _ in comps:
        grids.append(
            np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int64)
        )
    reader = _BitReader(data, pos)
    zz = ZIGZAG
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                reader.align_to_restart()
                pred = [0] * len(comps)
            mcu_count += 1
            for ci, dc_tbl, ac_tbl in scan:
                _, hs, vs, _ = comps[ci]
                grid = grids[ci]
                for by in range(vs):
                    for bx in range(hs):
                        blk = grid[my * vs + by, mx * hs + bx]
                        # DC
                        s = reader.decode(dc_tbl)
                        diff = _extend(reader.bits(s), s) if s else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        # AC run-length
                        k = 1
                        while k < 64:
                            rs = reader.decode(ac_tbl)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[zz[k]] = _extend(reader.bits(s), s)
                            k += 1
    # vectorized dequantize + IDCT per component
    planes = []
    for ci, (_, hs, vs, tq) in enumerate(comps):
        coef = grids[ci] * qt[tq][zz.argsort()][np.newaxis, np.newaxis, :]
        # ^ qt is in zigzag order; reorder to natural before multiply
        by, bx, _ = coef.shape
        blocks = coef.reshape(by, bx, 8, 8).astype(np.float64)
        # IDCT: Aᵀ X A over the last two axes
        pix = np.einsum("ki,yxkl,lj->yxij", _A, blocks, _A)
        plane = (
            pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        )
        # upsample by sample replication to full-res grid
        if hs != hmax or vs != vmax:
            plane = np.repeat(
                np.repeat(plane, vmax // vs, axis=0), hmax // hs, axis=1
            )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    bgr = np.stack([b, g, r], axis=-1)
    return np.clip(np.round(bgr), 0, 255).astype(np.uint8)


# --------------------------------------------------------------- encoder


class _BitWriter:
    __slots__ = ("out", "buf", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.buf >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _enc_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for ll in range(1, 17):
        for _ in range(bits[ll - 1]):
            out[vals[k]] = (code, ll)
            code += 1
            k += 1
        code <<= 1
    return out


def _magnitude(v: int) -> tuple[int, int]:
    """signed value → (category s, s-bit code)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _tab_arrays(tab: dict[int, tuple[int, int]]) -> tuple[np.ndarray, np.ndarray]:
    """dict symbol → (code, length) as two dense lookup arrays."""
    code = np.zeros(256, dtype=np.int64)
    length = np.zeros(256, dtype=np.int64)
    for sym, (c, ll) in tab.items():
        code[sym] = c
        length[sym] = ll
    return code, length


def _magnitude_vec(v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vector form of ``_magnitude``: signed int64 values → (category s,
    s-bit code). frexp's exponent IS bit_length for integers (exact in
    float64 up to 2⁵³ — far above any quantized coefficient)."""
    a = np.abs(v).astype(np.float64)
    s = np.frexp(a)[1].astype(np.int64)  # frexp(0) → exponent 0 → s=0 ✓
    mag = np.where(v >= 0, v, v + (np.int64(1) << s) - 1)
    return s, mag


def _entropy_encode_vec(
    qcoefs: list[np.ndarray],
    comp_q: list[int],
    dc_tabs: list[dict],
    ac_tabs: list[dict],
) -> bytearray:
    """Vectorized baseline entropy coder — bit-identical to the original
    per-coefficient ``_BitWriter`` loop (r18, guide §4.2: the pure-Python
    Huffman loop was ~0.31s/frame in _BitWriter.write alone; this path
    builds every (code, length) symbol with numpy, orders them by the
    interleaved MCU scan, and packs bits with one repeat/cumsum pass).

    Symbol ordering key: blocks are visited (yb, xb, component); within a
    block, seq 0/1 are the DC huffman code and DC magnitude bits, the AC
    coefficient at zigzag position k owns seq slots 2+8(k−1)..2+8(k−1)+5
    (up to three ZRLs, then its huffman code, then its magnitude bits),
    and EOB takes the tail slot — so a stable sort by (block, seq)
    reproduces the serial emission order exactly."""
    ncomp = len(qcoefs)
    nb = qcoefs[0].shape[0] * qcoefs[0].shape[1]
    EOB_SEQ = 2 + 8 * 63
    keys: list[np.ndarray] = []
    codes: list[np.ndarray] = []
    lens: list[np.ndarray] = []

    def emit(block_rank, pi, seq, code, length, mask=None):
        """Queue symbols (vector args); drop zero-length/masked entries."""
        key = (block_rank * ncomp + pi) * 1024 + seq
        if mask is not None:
            key, code, length = key[mask], code[mask], length[mask]
        keys.append(np.asarray(key, dtype=np.int64))
        codes.append(np.asarray(code, dtype=np.int64))
        lens.append(np.asarray(length, dtype=np.int64))

    for pi in range(ncomp):
        tix = 0 if comp_q[pi] == 0 else 1
        dc_code, dc_len = _tab_arrays(dc_tabs[tix])
        ac_code, ac_len = _tab_arrays(ac_tabs[tix])
        flat = qcoefs[pi].reshape(nb, 64)
        ranks = np.arange(nb, dtype=np.int64)

        # --- DC: differential against the previous block of THIS component
        dcs = flat[:, 0].astype(np.int64)
        diffs = np.empty_like(dcs)
        diffs[0] = dcs[0]
        diffs[1:] = dcs[1:] - dcs[:-1]
        s, mag = _magnitude_vec(diffs)
        emit(ranks, pi, np.zeros(nb, np.int64), dc_code[s], dc_len[s])
        nzdc = s > 0
        emit(ranks, pi, np.ones(nb, np.int64), mag, s, mask=nzdc)

        # --- AC: run-length over the zigzag tail, all blocks at once
        ac = flat[:, 1:]
        b_idx, k0 = np.nonzero(ac)  # row-major ⇒ ascending (block, k)
        k = (k0 + 1).astype(np.int64)
        vals = ac[b_idx, k0].astype(np.int64)
        prev_k = np.zeros_like(k)
        if len(k) > 1:
            same = b_idx[1:] == b_idx[:-1]
            prev_k[1:] = np.where(same, k[:-1], 0)
        run = k - prev_k - 1
        nzrl = run >> 4
        rem = run & 15
        s, mag = _magnitude_vec(vals)
        base = 2 + 8 * (k - 1)
        # ZRL symbols (run > 15): nzrl copies per coefficient, seq base+j
        zi = np.nonzero(nzrl)[0]
        if len(zi):
            rep = np.repeat(zi, nzrl[zi])
            ends = np.cumsum(nzrl[zi])
            j = np.arange(len(rep)) - np.repeat(ends - nzrl[zi], nzrl[zi])
            zc, zl = ac_tabs[tix][0xF0]
            emit(
                b_idx[rep].astype(np.int64),
                pi,
                base[rep] + j,
                np.full(len(rep), zc, np.int64),
                np.full(len(rep), zl, np.int64),
            )
        sym = (rem << 4) | s
        emit(b_idx.astype(np.int64), pi, base + 4, ac_code[sym], ac_len[sym])
        emit(b_idx.astype(np.int64), pi, base + 5, mag, s)

        # --- EOB for blocks whose last nonzero sits before k=63
        lastk = np.zeros(nb, np.int64)
        lastk[b_idx] = k  # ascending ⇒ final write per block is max k
        eb = np.nonzero(lastk < 63)[0]
        ec, el = ac_tabs[tix][0x00]
        emit(
            eb,
            pi,
            np.full(len(eb), EOB_SEQ, np.int64),
            np.full(len(eb), ec, np.int64),
            np.full(len(eb), el, np.int64),
        )

    key = np.concatenate(keys)
    code = np.concatenate(codes)
    length = np.concatenate(lens)
    order = np.argsort(key, kind="stable")
    code, length = code[order], length[order]

    # --- pack bits: MSB-first per symbol, pad the tail with 1s (spec)
    total = int(length.sum())
    ends = np.cumsum(length)
    starts = ends - length
    sym_of_bit = np.repeat(np.arange(len(length)), length)
    j = np.arange(total) - starts[sym_of_bit]
    shift = length[sym_of_bit] - 1 - j
    bits = ((code[sym_of_bit] >> shift) & 1).astype(np.uint8)
    pad = (-total) % 8
    if pad:
        bits = np.concatenate([bits, np.ones(pad, np.uint8)])
    data = np.packbits(bits)
    # byte stuffing: 0x00 after every 0xFF data byte (post-pass is
    # equivalent to the streaming writer's inline stuffing)
    ff = np.nonzero(data == 0xFF)[0]
    if len(ff):
        data = np.insert(data, ff + 1, 0)
    return bytearray(data.tobytes())


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 → Annex K as-is, 100 → all-ones."""
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (table * scale + 50) // 100
    return np.clip(q, 1, 255)


def encode(image: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H,W) grayscale or (H,W,3) BGR → baseline JPEG bytes
    (4:4:4, Annex K tables scaled by ``quality``)."""
    if image.dtype != np.uint8:
        raise ValueError("encode expects uint8")
    gray = image.ndim == 2
    h, w = image.shape[:2]
    if gray:
        planes = [image.astype(np.float64) - 128.0]
        qtabs = [_quality_scale(K1_LUMA, quality)]
        comp_q = [0]
    else:
        b = image[..., 0].astype(np.float64)
        g = image[..., 1].astype(np.float64)
        r = image[..., 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b
        planes = [y, cb, cr]
        qtabs = [
            _quality_scale(K1_LUMA, quality),
            _quality_scale(K2_CHROMA, quality),
        ]
        comp_q = [0, 1, 1]

    dc_tabs = [_enc_table(DC_LUMA_BITS, DC_LUMA_VALS),
               _enc_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_tabs = [_enc_table(AC_LUMA_BITS, AC_LUMA_VALS),
               _enc_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    # pad to multiples of 8 by edge replication, forward DCT + quantize
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    by, bx = ph // 8, pw // 8
    zz_nat = ZIGZAG  # natural index for zigzag position k
    qcoefs = []  # per component: (by, bx, 64) zigzag-ordered quantized
    for pi, plane in enumerate(planes):
        padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
        blocks = (
            padded.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
        )
        coef = np.einsum("ik,yxkl,jl->yxij", _A, blocks, _A)
        # qtabs are in NATURAL (row-major) order, as Annex K prints them
        qn = qtabs[comp_q[pi]].reshape(8, 8)
        quant = np.round(coef / qn).astype(np.int64)
        qcoefs.append(
            quant.reshape(by, bx, 64)[:, :, zz_nat]
        )  # natural → zigzag order

    # entropy-code (interleaved 4:4:4 → one block per component per MCU)
    # — vectorized (r18, guide §4.2): bit-identical to the former
    # per-coefficient _BitWriter loop, which spent ~0.3s/frame in Python
    # bit appends; see _entropy_encode_vec.
    scan_bytes = _entropy_encode_vec(qcoefs, comp_q, dc_tabs, ac_tabs)

    # assemble marker stream
    out = bytearray(b"\xFF\xD8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend([0xFF, marker])
        ln = len(payload) + 2
        out.extend([ln >> 8, ln & 0xFF])
        out.extend(payload)

    for tq, q in enumerate(qtabs):
        # DQT payload is ZIGZAG-ordered per the spec (payload[k] =
        # Q_natural[ZIGZAG[k]]) — the decoder's argsort inverse restores
        # natural order, and third-party decoders interoperate
        seg(0xDB, bytes([tq]) + bytes(int(q[z]) for z in ZIGZAG))
    ncomp = len(planes)
    sof = bytearray([8, h >> 8, h & 0xFF, w >> 8, w & 0xFF, ncomp])
    for ci in range(ncomp):
        sof.extend([ci + 1, 0x11, comp_q[ci]])  # H=V=1 (4:4:4)
    seg(0xC0, bytes(sof))
    for tc, tables in ((0, (DC_LUMA_BITS, DC_LUMA_VALS,
                            DC_CHROMA_BITS, DC_CHROMA_VALS)),
                       (1, (AC_LUMA_BITS, AC_LUMA_VALS,
                            AC_CHROMA_BITS, AC_CHROMA_VALS))):
        seg(0xC4, bytes([tc << 4 | 0] + tables[0] + tables[1]))
        if ncomp > 1:
            seg(0xC4, bytes([tc << 4 | 1] + tables[2] + tables[3]))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        t = 0 if comp_q[ci] == 0 else 1
        sos.extend([ci + 1, t << 4 | t])
    sos.extend([0, 63, 0])
    seg(0xDA, bytes(sos))
    out.extend(scan_bytes)
    out.extend(b"\xFF\xD9")  # EOI
    return bytes(out)
