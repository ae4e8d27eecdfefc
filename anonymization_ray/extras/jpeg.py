"""Pure-Python baseline JPEG codec (grayscale), no external codecs.

The multimodal decode stage (``extras/multimodal.py``) is honest about what
this container can decode: PNG decodes via zlib, and — since round 4 —
BASELINE sequential grayscale JPEG decodes here with numpy-only math:

- entropy layer: canonical Huffman per ITU-T T.81 Annex C (tables are read
  from the file's DHT segments, so any self-consistent table works; the
  encoder embeds the Annex K K.3.1/K.3.2 luminance tables)
- transform layer: 8x8 DCT-II / DCT-III as matrix products with the
  orthonormal DCT matrix (einsum over all blocks at once)
- quantization: table read from DQT; the encoder uses Annex K's luminance
  table with ``q[0][0] = 24`` so a FLAT 8x8 block reconstructs to
  ``clip(3*round((g-128)/3) + 128)`` with no ambiguous half-rounding —
  that closed form is the DuckDB oracle for the ``multimodal_jpeg_stats``
  registry query (exact thirds never hit .5, so numpy's banker rounding
  and SQL's half-away ROUND agree).

Out of scope (still a clearly-marked NotImplementedError in the decode
stage): progressive JPEG (SOF2), multi-component color, restart markers,
arithmetic coding, audio, video.

Entropy decoding is a per-bit Python loop by nature (variable-length codes
have a serial dependency); it runs inside the actor-pool decode stage where
payloads are MB-scale and batches small, and everything after the symbol
stream (dezigzag, dequantize, IDCT, clip) is vectorized across all blocks.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K typical luminance tables -------------------------

_QTAB = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
# DC quantizer forced to 24 => flat blocks reconstruct on an exact-thirds
# grid (see module docstring / the SQL oracle)
_QTAB[0, 0] = 24

_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _zigzag() -> np.ndarray:
    """Flat indices (row*8+col) in zigzag scan order."""
    order = []
    for s in range(15):
        diag = [(i, s - i) for i in range(8) if 0 <= s - i < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals run bottom-left -> top-right
        order.extend(diag)
    return np.array([i * 8 + j for i, j in order], dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)


def _dct_matrix() -> np.ndarray:
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * n + 1) * k * np.pi / 16.0)
    c[0, :] = 1.0 / np.sqrt(8.0)
    return c


_C = _dct_matrix()


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical code assignment (T.81 Annex C): symbol -> (code, length)."""
    enc: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self._n -= 8
            self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size category, additional bits)."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


def encode_jpeg_gray(pixels: np.ndarray) -> bytes:
    """Baseline sequential grayscale JFIF from an (h, w) uint8 array.
    Dimensions must be multiples of 8 (the test corpus uses 16x16)."""
    h, w = pixels.shape
    if h % 8 or w % 8:
        raise ValueError("encode_jpeg_gray requires multiple-of-8 dims")
    blocks = (
        pixels.astype(np.float64)
        .reshape(h // 8, 8, w // 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    ) - 128.0
    coef = np.einsum("ij,njk,lk->nil", _C, blocks, _C)
    q = np.round(coef / _QTAB).astype(np.int64)
    zz = q.reshape(-1, 64)[:, _ZZ]

    dc_enc = _huff_encode_table(_DC_BITS, _DC_VALS)
    ac_enc = _huff_encode_table(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    for blk in zz:
        s, extra = _magnitude(int(blk[0]) - prev_dc)
        prev_dc = int(blk[0])
        code, ln = dc_enc[s]
        bw.write(code, ln)
        if s:
            bw.write(extra, s)
        run = 0
        for v in blk[1:]:
            v = int(v)
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_enc[0xF0]  # ZRL
                bw.write(code, ln)
                run -= 16
            s, extra = _magnitude(v)
            code, ln = ac_enc[(run << 4) | s]
            bw.write(code, ln)
            bw.write(extra, s)
            run = 0
        if run:
            code, ln = ac_enc[0x00]  # EOB
            bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    qzz = _QTAB.reshape(-1)[_ZZ]
    dqt = seg(0xFFDB, b"\x00" + bytes(int(x) for x in qzz))
    sof = seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    dht = seg(
        0xFFC4,
        b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)
        + b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS),
    )
    sos = seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return (
        b"\xff\xd8" + dqt + sof + dht + sos + bytes(bw.out) + b"\xff\xd9"
    )


# --- decoder ---------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise EOFError("entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0xD9
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise EOFError("marker in entropy stream")
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {
        (ln, code): sym for sym, (code, ln) in _huff_encode_table(bits, vals).items()
    }


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Baseline sequential single-component JPEG -> (h, w) uint8.
    Progressive (SOF2), color, restart intervals, and arithmetic coding
    raise NotImplementedError — the honest codec gate."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_q = 0
    dc_id = ac_id = 0
    data = b""
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xDB:
            o = 0
            while o < len(body):
                pq, tq = body[o] >> 4, body[o] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                zzq = np.frombuffer(body[o + 1 : o + 65], dtype=np.uint8).astype(
                    np.int64
                )
                qtabs[tq] = zzq[_UNZZ].reshape(8, 8)
                o += 65
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0) decodes in this environment"
            )
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", body[:6])
            if prec != 8 or ncomp != 1:
                raise NotImplementedError("only 8-bit single-component JPEG")
            comp_q = body[8]
        elif marker == 0xC4:
            o = 0
            while o < len(body):
                tc, th = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                n = sum(bits)
                vals = list(body[o + 17 : o + 17 + n])
                htabs[(tc, th)] = _huff_decode_table(bits, vals)
                o += 17 + n
        elif marker == 0xDD:
            if struct.unpack(">H", body[:2])[0] != 0:
                raise NotImplementedError("restart intervals")
        elif marker == 0xDA:
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            data = payload[pos + 2 + ln :]
            break
        pos += 2 + ln
    if h is None or not data:
        raise ValueError("truncated JPEG")
    dc_tab = htabs[(0, dc_id)]
    ac_tab = htabs[(1, ac_id)]
    qtab = qtabs[comp_q]
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    nblocks = bh * bw_
    zz = np.zeros((nblocks, 64), dtype=np.int64)
    br = _BitReader(data)
    prev_dc = 0
    for b in range(nblocks):
        s = _read_symbol(br, dc_tab)
        diff = _extend(br.bits(s), s) if s else 0
        prev_dc += diff
        zz[b, 0] = prev_dc
        k = 1
        while k < 64:
            rs = _read_symbol(br, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("AC run past block end")
            zz[b, k] = _extend(br.bits(s), s)
            k += 1
    coef = (zz[:, _UNZZ].reshape(-1, 8, 8)) * qtab
    spatial = np.einsum("ji,njk,kl->nil", _C, coef.astype(np.float64), _C)
    px = np.clip(np.round(spatial) + 128.0, 0, 255).astype(np.uint8)
    out = (
        px.reshape(bh, bw_, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw_ * 8)
    )
    return out[:h, :w]
