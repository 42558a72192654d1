"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

JPEG was the last *image* format behind the multimodal stages'
documented codec stub (``stages/multimodal.py``): unlike MP3/H.264 it
needs no codec library — baseline sequential JPEG is an 8x8 DCT, the
public Annex K quantization/Huffman tables, and a bit-packed entropy
stream, all expressible in numpy + stdlib.  This module implements

* ``encode_jpeg``: 8-bit RGB -> baseline JFIF bytes (4:4:4 or 4:2:0,
  standard Annex K tables scaled by the libjpeg quality formula,
  optional restart intervals).  Deterministic: same pixels + options ->
  same bytes.
* ``decode_jpeg``: baseline JFIF/EXIF bytes -> 8-bit RGB.  Handles
  grayscale and 3-component scans, arbitrary 1-2x sampling factors
  (4:4:4 / 4:2:2 / 4:2:0), multi-segment DQT/DHT, restart markers,
  and skips APPn/COM segments.  Progressive (SOF2) and arithmetic
  coding raise ``ValueError``.

The DCT is the orthonormal matrix form (F = C B C^T with
C[u,x] = c(u) cos((2x+1)u pi/16), c(0)=sqrt(1/8) else 1/2), applied to
all blocks at once with ``einsum``; the per-coefficient entropy coding
walks only the nonzero coefficients of each quantized block.

Correctness is pinned two independent ways in tests/test_jpeg.py:
a HAND-ASSEMBLED spec-level stream (markers and bits written out
byte-by-byte from T.81, never through this encoder) must decode to its
closed-form pixels, and encode->decode round trips must reconstruct
smooth images within quantization error bounds.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# public Annex K tables
# ---------------------------------------------------------------------------

#: zigzag index -> raster index (T.81 Figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

#: raster index -> zigzag index
UNZIGZAG = np.argsort(ZIGZAG)

#: Annex K Table K.1 (luminance) / K.2 (chrominance), raster order
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

#: Annex K Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
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
    0xF9, 0xFA]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]


def _dct_matrix() -> np.ndarray:
    u = np.arange(8).reshape(8, 1).astype(np.float64)
    x = np.arange(8).reshape(1, 8).astype(np.float64)
    c = np.cos((2 * x + 1) * u * np.pi / 16.0) * 0.5
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_DCT = _dct_matrix()


def quality_scaled_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """Annex K tables scaled with the (public) libjpeg quality formula."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (QUANT_LUMA, QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# ---------------------------------------------------------------------------
# canonical Huffman code construction (T.81 Annex C)
# ---------------------------------------------------------------------------

def _build_encode_table(bits: List[int], vals: List[int]) -> Dict[int, Tuple[int, int]]:
    """(BITS, HUFFVAL) -> {symbol: (code, length)} canonical assignment."""
    table: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return table


class _DecodeTable:
    """mincode/maxcode/valptr canonical decoder state (T.81 F.2.2.3)."""

    __slots__ = ("mincode", "maxcode", "valptr", "vals")

    def __init__(self, bits: List[int], vals: List[int]):
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        self.vals = list(vals)
        code = 0
        k = 0
        for length in range(1, 17):
            if bits[length - 1]:
                self.valptr[length] = k
                self.mincode[length] = code
                code += bits[length - 1]
                k += bits[length - 1]
                self.maxcode[length] = code - 1
            code <<= 1


# ---------------------------------------------------------------------------
# bit I/O
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit packer with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "nbits")

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
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)

    def raw_marker(self, byte2: int) -> None:
        """Emit FF xx outside the stuffed stream (restart markers)."""
        self.byte_align()
        self.out += bytes((0xFF, byte2))


def _bit_length(v: int) -> int:
    return int(v).bit_length()


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float64 -> (n_blocks_y, n_blocks_x, 8, 8), edge-padded."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)


def _encode_block(zz: np.ndarray, prev_dc: int, dc_tab, ac_tab,
                  w: _BitWriter) -> int:
    """Entropy-encode one zigzagged quantized block; returns its DC."""
    dc = int(zz[0])
    diff = dc - prev_dc
    size = _bit_length(abs(diff))
    code, length = dc_tab[size]
    w.write(code, length)
    if size:
        w.write(diff if diff > 0 else diff + (1 << size) - 1, size)
    nz = np.nonzero(zz[1:])[0]
    prev = 0
    for idx in nz:
        k = int(idx) + 1
        run = k - prev - 1
        while run >= 16:
            zcode, zlen = ac_tab[0xF0]
            w.write(zcode, zlen)
            run -= 16
        v = int(zz[k])
        vsize = _bit_length(abs(v))
        acode, alen = ac_tab[(run << 4) | vsize]
        w.write(acode, alen)
        w.write(v if v > 0 else v + (1 << vsize) - 1, vsize)
        prev = k
    if prev != 63:
        ecode, elen = ac_tab[0x00]
        w.write(ecode, elen)
    return dc


def _dht_segment(tc_th: int, bits: List[int], vals: List[int]) -> bytes:
    body = bytes([tc_th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(arr: np.ndarray, quality: int = 90,
                restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """(H, W, 3) uint8 RGB -> baseline JFIF bytes.

    ``subsampling``: ``"444"`` (no chroma subsampling, default — bit
    cheapest to verify) or ``"420"`` (2x2 chroma averaging, the common
    wild layout; MCU = 4 Y blocks + Cb + Cr).  ``restart_interval`` > 0
    inserts an RSTn marker every that many MCUs (and a DRI segment),
    which bounds error propagation in a corrupted stream and exercises
    the decoder's restart path."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape} {arr.dtype}")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    h, w = arr.shape[:2]
    qy, qc = quality_scaled_tables(quality)

    # color transform (JFIF / BT.601), then level shift
    x = arr.astype(np.float64)
    r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    yp = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
    cbp = -0.168736 * r - 0.331264 * g + 0.5 * b
    crp = 0.5 * r - 0.418688 * g - 0.081312 * b
    if subsampling == "420":
        # pad to even, then 2x2 box average
        ph, pw = (-h) % 2, (-w) % 2
        if ph or pw:
            cbp = np.pad(cbp, ((0, ph), (0, pw)), mode="edge")
            crp = np.pad(crp, ((0, ph), (0, pw)), mode="edge")
        hh, ww = cbp.shape
        cbp = cbp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
        crp = crp.reshape(hh // 2, 2, ww // 2, 2).mean(axis=(1, 3))
        # luma plane must cover whole MCUs (16x16)
        yh, yw = (-h) % 16, (-w) % 16
        if yh or yw:
            yp = np.pad(yp, ((0, yh), (0, yw)), mode="edge")
        ch, cw = (-cbp.shape[0]) % 8, (-cbp.shape[1]) % 8
        if ch or cw:
            cbp = np.pad(cbp, ((0, ch), (0, cw)), mode="edge")
            crp = np.pad(crp, ((0, ch), (0, cw)), mode="edge")
    planes = [yp, cbp, crp]

    # DCT + quantize every block of every plane at once, then zigzag
    zz_planes = []
    for ci, plane in enumerate(planes):
        blocks = _plane_blocks(plane)                 # (by, bx, 8, 8)
        f = np.einsum("ux,yzxv,wv->yzuw", _DCT, blocks, _DCT)
        q = np.round(f / (qy if ci == 0 else qc)).astype(np.int64)
        zz_planes.append(q.reshape(q.shape[0], q.shape[1], 64)[:, :, ZIGZAG])

    dc_y = _build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)

    ysamp = 2 if subsampling == "420" else 1
    by, bx = zz_planes[1].shape[:2]                   # chroma blocks = MCUs
    writer = _BitWriter()
    prev = [0, 0, 0]
    mcu_count = 0
    rst = 0
    for yb in range(by):
        for xb in range(bx):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                writer.raw_marker(0xD0 + rst)
                rst = (rst + 1) & 7
                prev = [0, 0, 0]
            for by_ in range(ysamp):                  # Y blocks of the MCU
                for bx_ in range(ysamp):
                    prev[0] = _encode_block(
                        zz_planes[0][yb * ysamp + by_, xb * ysamp + bx_],
                        prev[0], dc_y, ac_y, writer)
            for ci in (1, 2):
                prev[ci] = _encode_block(
                    zz_planes[ci][yb, xb], prev[ci], dc_c, ac_c, writer)
            mcu_count += 1
    writer.byte_align()

    # headers
    out = bytearray(b"\xff\xd8")                                   # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes((1, 1, 0)) + struct.pack(">HH", 1, 1) + bytes((0, 0)))
    for tq, tab in ((0, qy), (1, qc)):                             # DQT
        out += (b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq])
                + bytes(tab.reshape(64)[ZIGZAG].astype(np.uint8)))
    if restart_interval:                                           # DRI
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    ysamp_byte = (ysamp << 4) | ysamp
    sof = bytes((8,)) + struct.pack(">HH", h, w) + bytes((3,))     # SOF0
    for cid, samp, tq in ((1, ysamp_byte, 0), (2, 0x11, 1), (3, 0x11, 1)):
        sof += bytes((cid, samp, tq))
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0x00, DC_LUMA_BITS, DC_LUMA_VALS)          # DHT x4
    out += _dht_segment(0x10, AC_LUMA_BITS, AC_LUMA_VALS)
    out += _dht_segment(0x01, DC_CHROMA_BITS, DC_CHROMA_VALS)
    out += _dht_segment(0x11, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes((3,)) + bytes((1, 0x00, 2, 0x11, 3, 0x11)) + bytes((0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos     # SOS
    out += writer.out
    out += b"\xff\xd9"                                             # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over destuffed entropy bytes (one restart segment)."""

    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.bits):
            # past the end: T.81 pads with 1s (F.2.2.5 fills with a
            # synthetic all-ones byte so a final truncated EOB resolves)
            return 1
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        end = self.pos + n
        if end <= len(self.bits):
            chunk = self.bits[self.pos:end]
            self.pos = end
            for b in chunk:
                v = (v << 1) | int(b)
            return v
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: _DecodeTable) -> int:
        code = self.read_bit()
        length = 1
        while length <= 16:
            if table.maxcode[length] >= code >= table.mincode[length]:
                return table.vals[table.valptr[length] + code - table.mincode[length]]
            code = (code << 1) | self.read_bit()
            length += 1
        raise ValueError("invalid Huffman code in JPEG stream")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct_blocks(coeffs: np.ndarray) -> np.ndarray:
    """(n, 8, 8) dequantized -> (n, 8, 8) float pixels (pre level shift)."""
    return np.einsum("xu,nuv,vw->nxw", _DCT.T, coeffs, _DCT)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes -> (H, W, 3) uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    n = len(payload)
    qtabs: Dict[int, np.ndarray] = {}
    htabs: Dict[Tuple[int, int], _DecodeTable] = {}
    restart_interval = 0
    frame = None                       # (h, w, [(cid, hs, vs, tq), ...])
    scan = None                        # [(comp_index, dc_id, ac_id), ...]
    entropy_start = None

    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1
        # the fill-byte skip can advance past the loop-entry bound, so
        # re-validate before every read (a trailing FF-FF run must be a
        # ValueError, not IndexError/struct.error leaking to the caller)
        if pos + 1 >= n:
            raise ValueError("truncated JPEG stream")
        marker = payload[pos + 1]
        if marker == 0xD9:             # EOI before SOS: malformed
            break
        if pos + 4 > n:
            raise ValueError("truncated JPEG stream")
        seglen = struct.unpack_from(">H", payload, pos + 2)[0]
        body = payload[pos + 4:pos + 2 + seglen]
        if seglen < 2 or len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        pos += 2 + seglen
        if marker == 0xDB:             # DQT (possibly several tables)
            bp = 0
            while bp < len(body):
                if bp + 65 > len(body):
                    raise ValueError("truncated DQT segment")
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                flat = np.frombuffer(body, np.uint8, 64, bp + 1).astype(np.int64)
                tab = np.zeros(64, np.int64)
                tab[ZIGZAG] = flat     # stored in zigzag order
                qtabs[tq] = tab.reshape(8, 8)
                bp += 65
        elif marker == 0xC4:           # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                if bp + 17 > len(body):
                    raise ValueError("truncated DHT segment")
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1:bp + 17])
                cnt = sum(bits)
                if bp + 17 + cnt > len(body):
                    raise ValueError("truncated DHT segment")
                vals = list(body[bp + 17:bp + 17 + cnt])
                htabs[(tc, th)] = _DecodeTable(bits, vals)
                bp += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:    # SOF0/1 baseline
            if len(body) < 6:
                raise ValueError("truncated SOF segment")
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack_from(">HH", body, 1)
            if h == 0 or w == 0:
                raise ValueError("zero JPEG frame dimension")
            nf = body[5]
            if nf == 0:
                raise ValueError("SOF declares zero components")
            if len(body) < 6 + 3 * nf:
                raise ValueError("truncated SOF segment")
            comps = []
            for ci in range(nf):
                cid, samp, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0) supported")
        elif marker == 0xDD:           # DRI
            if len(body) < 2:
                raise ValueError("truncated DRI segment")
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xDA:           # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            if not body:
                raise ValueError("truncated SOS segment")
            ns = body[0]
            if ns != len(frame[2]):
                # legal baseline multi-scan (non-interleaved) layouts put
                # each component in its own SOS; this decoder reads one
                # interleaved scan only — fail loudly, never chroma-less
                raise ValueError(
                    "only single interleaved-scan JPEG supported "
                    f"(scan has {ns} of {len(frame[2])} components)"
                )
            if len(body) < 1 + 2 * ns + 3:
                raise ValueError("truncated SOS segment")
            scan = []
            cids = [c[0] for c in frame[2]]
            for si in range(ns):
                cid, tabs = body[1 + 2 * si], body[2 + 2 * si]
                if cid not in cids:
                    raise ValueError("SOS references an undeclared component")
                scan.append((cids.index(cid), tabs >> 4, tabs & 0x0F))
            entropy_start = pos
            break
        # APPn / COM / anything else: skipped via seglen

    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    h, w, comps = frame

    # slice the entropy-coded data into restart segments
    segments: List[bytes] = []
    cur = bytearray()
    p = entropy_start
    while p < n:
        byte = payload[p]
        if byte == 0xFF and p + 1 < n:
            nxt = payload[p + 1]
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:    # RSTn: segment boundary
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break                      # EOI or next marker
        cur.append(byte)
        p += 1
    segments.append(bytes(cur))

    for (_ci, dct_id, act_id) in scan:
        if (0, dct_id) not in htabs or (1, act_id) not in htabs:
            raise ValueError("scan references an undeclared Huffman table")
    for (_cid, _hs, _vs, tq_) in comps:
        if tq_ not in qtabs:
            raise ValueError("frame references an undeclared quant table")

    # EVERY component's factors must be >= 1 (a max-only check lets a
    # single zero nibble reach the upsample division as ZeroDivisionError)
    if any(hs == 0 or vs == 0 for _cid, hs, vs, _tq in comps):
        raise ValueError("component sampling factor must be >= 1")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    # per-component coefficient planes, in blocks
    cshapes = []
    coeff = []
    for cid, hs, vs, tq in comps:
        bw, bh = mcux * hs, mcuy * vs
        cshapes.append((bh, bw))
        coeff.append(np.zeros((bh * bw, 8, 8), dtype=np.int64))

    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    prev_dc = [0] * len(comps)
    mcu_index = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (restart_interval and mcu_index
                    and mcu_index % restart_interval == 0):
                try:
                    reader = _BitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError(
                        "JPEG stream is missing a restart segment its DRI "
                        "interval requires"
                    ) from None
                prev_dc = [0] * len(comps)
            for (ci, dct_id, act_id) in scan:
                _, hs, vs, _ = comps[ci]
                dtab = htabs[(0, dct_id)]
                atab = htabs[(1, act_id)]
                for by_ in range(vs):
                    for bx_ in range(hs):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.decode_symbol(dtab)
                        if size > 15:
                            # a DC size category above 15 can only come
                            # from a corrupt DHT (spec max is 11)
                            raise ValueError("invalid DC size category")
                        if size:
                            prev_dc[ci] += _extend(reader.read_bits(size), size)
                        zz[0] = prev_dc[ci]
                        k = 1
                        while k < 64:
                            sym = reader.decode_symbol(atab)
                            if sym == 0x00:          # EOB
                                break
                            run, vsize = sym >> 4, sym & 0x0F
                            if vsize == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16              # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(vsize), vsize)
                            k += 1
                        row = my * vs + by_
                        col = mx * hs + bx_
                        blk = np.zeros(64, dtype=np.int64)
                        blk[ZIGZAG] = zz
                        coeff[ci][row * cshapes[ci][1] + col] = blk.reshape(8, 8)
            mcu_index += 1

    # dequantize + IDCT per component, vectorized over all blocks
    planes = []
    for (cid, hs, vs, tq), (bh, bw), blocks in zip(comps, cshapes, coeff):
        deq = blocks * qtabs[tq].reshape(1, 8, 8)
        pix = _idct_blocks(deq.astype(np.float64)) + 128.0
        plane = (pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                 .reshape(bh * 8, bw * 8))
        # chroma upsample to full MCU resolution
        if hs != hmax:
            plane = np.repeat(plane, hmax // hs, axis=1)
        if vs != vmax:
            plane = np.repeat(plane, vmax // vs, axis=0)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return np.repeat(y[:, :, None], 3, axis=2)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
