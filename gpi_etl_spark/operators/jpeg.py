"""Baseline JPEG codec — stdlib + numpy, no PIL.

Closes the "JPEG needs third-party code" gap for the common case: a
from-scratch implementation of baseline sequential JFIF over the PUBLIC
ITU-T T.81 spec. Scope (strict-raise outside it):

* decode: SOI/APP*/COM/DQT/DHT/DRI/SOF0/SOS parse, Huffman-coded MCU
  stream with byte stuffing and restart markers, dequantize, 8×8
  IDCT (orthonormal DCT-III via matrix multiply), level shift,
  YCbCr→RGB (JFIF full-range), clamp. Components: 1 (grayscale) or 3
  with NO chroma subsampling (4:4:4). Progressive (SOF2), arithmetic
  coding, 12-bit, and subsampled scans raise ``NotImplementedError``.
* encode: the matching baseline writer (4:4:4 or grayscale, Annex K
  standard quantization tables scaled by ``quality``, Annex K standard
  Huffman tables) — used to build test fixtures and round-trip checks.

Exactness property used by the q109 oracle: a FLAT GRAY image (R=G=B=v)
at quality=100 round-trips EXACTLY — the color transform maps equal
channels to Y=v, Cb=Cr=128 with zero rounding, every block is DC-only,
and the quality-100 quantization table is all ones, so dequantized
coefficients equal the originals and the IDCT returns the constant
block bit-for-bit.

Python-loop Huffman decoding is ~µs/block — fine for fixture-sized
images; at lake scale the decode runs inside ``mapInPandas`` next to
the payload bytes like every other codec here, and a deployment would
swap in a vectorized library behind the same dispatch.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Shared tables
# ---------------------------------------------------------------------------

#: zig-zag scan order: index i of the scan → (row, col) flat index
_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: ITU-T T.81 Annex K.1 — standard luminance / chrominance quant tables
_STD_LUMA_Q = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_STD_CHROMA_Q = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

#: Annex K.3 standard Huffman tables: (bits[1..16], huffval)
_STD_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
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
_STD_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
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


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix: ``coeffs = M @ block @ M.T``."""
    k = np.arange(8)
    m = np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m / 2


_DCT_M = _dct_matrix()


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling (libjpeg convention, public)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255)


def _huffman_code_table(bits, huffval):
    """(bits, huffval) → {symbol: (code, length)} per T.81 C.2."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[huffval[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huffman_decode_table(bits, huffval):
    """(bits, huffval) → {(code, length): symbol}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(code, length)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

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
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """Value → (size, amplitude bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    if v < 0:
        v += (1 << size) - 1
    return size, v


def _encode_block(coef, dc_prev, dc_codes, ac_codes, w: _BitWriter) -> int:
    zz = coef[_ZIGZAG]
    dc = int(zz[0])
    size, amp = _magnitude(dc - dc_prev)
    code, ln = dc_codes[size]
    w.write(code, ln)
    if size:
        w.write(amp, size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0 and i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, amp = _magnitude(v)
        code, ln = ac_codes[(run << 4) | size]
        w.write(code, ln)
        w.write(amp, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def encode_jpeg(px: "np.ndarray", quality: int = 90) -> bytes:
    """RGB (h, w, 3) or gray (h, w) uint8 array → baseline JFIF bytes
    (4:4:4, standard tables)."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [y, cb, cr]

    qs = [_scaled_quant(_STD_LUMA_Q, quality)]
    if not gray:
        qs.append(_scaled_quant(_STD_CHROMA_Q, quality))

    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    dc_codes = [_huffman_code_table(*_STD_DC_LUMA),
                _huffman_code_table(*_STD_DC_CHROMA)]
    ac_codes = [_huffman_code_table(*_STD_AC_LUMA),
                _huffman_code_table(*_STD_AC_CHROMA)]

    writer = _BitWriter()
    dc_prev = [0] * len(planes)
    # interleaved MCU = one block per component at 4:4:4
    for by in range(0, bh, 8):
        for bx in range(0, bw, 8):
            for ci, plane in enumerate(planes):
                block = np.empty((8, 8))
                ys, xs = min(by + 8, h) - by, min(bx + 8, w) - bx
                block[:ys, :xs] = plane[by:by + ys, bx:bx + xs]
                if ys < 8:
                    block[ys:, :] = block[ys - 1, :]
                if xs < 8:
                    block[:, xs:] = block[:, xs - 1:xs]
                coefs = _DCT_M @ (block - 128.0) @ _DCT_M.T
                q = qs[min(ci, len(qs) - 1)]
                coef = np.round(coefs.reshape(64) / q).astype(np.int64)
                t = min(ci, 1)
                dc_prev[ci] = _encode_block(
                    coef, dc_prev[ci], dc_codes[t], ac_codes[t], writer
                )
    writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qs):
        zz = np.empty(64, dtype=np.uint8)
        zz[np.arange(64)] = q[_ZIGZAG]
        out += seg(0xFFDB, bytes([i]) + zz.tobytes())
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, min(ci, len(qs) - 1)])  # 4:4:4
    out += seg(0xFFC0, sof)
    tables = [(0x00, _STD_DC_LUMA), (0x10, _STD_AC_LUMA)]
    if not gray:
        tables += [(0x01, _STD_DC_CHROMA), (0x11, _STD_AC_CHROMA)]
    for tc, (bits, huffval) in tables:
        out += seg(0xFFC4, bytes([tc]) + bytes(bits[1:]) + bytes(huffval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        t = min(ci, 1)
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return out


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-RST marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos + 1 >= len(self.data):
            raise ValueError("JPEG: truncated entropy-coded stream")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # RST handled by caller via sync()
                raise _RestartMarker(nxt)
            else:
                raise EOFError("marker in entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume an expected RSTn marker and reset bit state."""
        self.acc = 0
        self.nbits = 0
        assert self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _read_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bit()
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    """Amplitude bits → signed value (T.81 F.2.2.1 EXTEND)."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JFIF bytes → dims + per-channel means + pixels, matching
    the other codecs' return shape (see module docstring for scope)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(payload):
            raise ValueError("JPEG: truncated marker segment")
        ln = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4: pos + 2 + ln]
        if len(body) < ln - 2:
            raise ValueError("JPEG: truncated marker segment")
        pos += 2 + ln
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(body, dtype=np.uint8, count=64, offset=off + 1)
                table = np.empty(64, dtype=np.int64)
                table[_ZIGZAG] = zz
                qt[tq] = table
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = [0] + list(body[off + 1: off + 17])
                n = sum(bits)
                huffval = list(body[off + 17: off + 17 + n])
                huff[(tc, th)] = _huffman_decode_table(bits, huffval)
                off += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = body[6 + 3 * ci: 9 + 3 * ci]
                if sampling != 0x11:
                    raise NotImplementedError(
                        "chroma subsampling (only 4:4:4 supported)"
                    )
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0) JPEG supported"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tables = {}
            for ci in range(ns):
                cid, tt = body[1 + 2 * ci], body[2 + 2 * ci]
                scan_tables[cid] = (tt >> 4, tt & 0xF)
            h, w, comps = sof
            planes = _decode_scan(
                payload, pos, h, w, comps, scan_tables, qt, huff,
                restart_interval,
            )
            return _planes_to_result(planes, h, w)
    raise ValueError("no SOS scan found")


def _decode_scan(data, pos, h, w, comps, scan_tables, qt, huff,
                 restart_interval):
    r = _BitReader(data, pos)
    bh, bw = -(-h // 8), -(-w // 8)
    planes = [np.zeros((bh * 8, bw * 8)) for _ in comps]
    dc_prev = [0] * len(comps)
    mcu = 0
    for by in range(bh):
        for bx in range(bw):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.acc = 0
                r.nbits = 0
                # skip to the RST marker (may be byte-aligned already)
                while r.pos + 1 < len(data) and not (
                    data[r.pos] == 0xFF and 0xD0 <= data[r.pos + 1] <= 0xD7
                ):
                    r.pos += 1
                if r.pos + 1 >= len(data):
                    raise ValueError("JPEG: missing restart marker")
                r.pos += 2
                dc_prev = [0] * len(comps)
            for ci, (cid, tq) in enumerate(comps):
                td, ta = scan_tables[cid]
                try:
                    zz = _decode_block(r, huff[(0, td)], huff[(1, ta)])
                except _RestartMarker:
                    raise ValueError("unexpected restart marker") from None
                zz[0] += dc_prev[ci]
                dc_prev[ci] = zz[0]
                coef = np.empty(64, dtype=np.int64)
                coef[_ZIGZAG] = zz  # un-zigzag (qt is already natural order)
                block = (coef * qt[tq]).reshape(8, 8)
                pix = _DCT_M.T @ block @ _DCT_M + 128.0
                planes[ci][by * 8: by * 8 + 8, bx * 8: bx * 8 + 8] = pix
            mcu += 1
    return planes


def _decode_block(r: _BitReader, dc_table, ac_table) -> np.ndarray:
    zz = np.zeros(64, dtype=np.int64)
    size = _read_symbol(r, dc_table)
    zz[0] = _extend(r.bits(size), size) if size else 0
    i = 1
    while i < 64:
        rs = _read_symbol(r, ac_table)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("AC run past block end")
        zz[i] = _extend(r.bits(size), size)
        i += 1
    return zz


def _planes_to_result(planes, h, w):
    planes = [p[:h, :w] for p in planes]
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255)
        px = np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    else:
        y, cb, cr = planes
        cb = cb - 128.0
        cr = cr - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        px = np.clip(
            np.round(np.stack([r, g, b], axis=2)), 0, 255
        ).astype(np.uint8)
    gray = px.astype(np.float64).mean(axis=2)
    return {
        "media_type": "image", "format": "jpeg", "width": int(w),
        "height": int(h), "duration_ms": None, "sample_rate": None,
        "feature": [
            float(px[:, :, 0].mean()), float(px[:, :, 1].mean()),
            float(px[:, :, 2].mean()), float(gray.std()),
        ],
        "pixels": px,
    }
