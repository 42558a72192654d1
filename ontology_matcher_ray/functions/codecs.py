"""Pure-numpy codecs for UNCOMPRESSED media containers.

No image/audio libraries exist in this container, but the uncompressed
container formats are public, byte-level-simple specs — so decode is
implemented for real here:

* ``P6`` binary PPM (Netpbm spec): ASCII header + raw RGB rows;
* ``BM`` 24-bit uncompressed BMP (BITMAPINFOHEADER): bottom-up BGR rows,
  stride padded to 4 bytes;
* ``RIFF/WAVE`` PCM16 (Microsoft RIFF spec): chunked fmt + data;
* ``PNG`` 8-bit gray/RGB/RGBA, non-interlaced (the one "compressed"
  image format that needs NO codec library: its compression is stdlib
  ``zlib`` and its five scanline filters are small numpy/byte math —
  RFC 2083 / the W3C PNG spec).

Baseline JPEG is also decoded for real — in its own module
(``functions/jpeg.py``: 8x8 DCT + the public Annex K tables, pure
numpy + stdlib).  The remaining compressed formats (MP3/H.264)
genuinely need codec libraries and stay behind the featurizer's
documented stub (``stages/multimodal.MediaFeaturizer``).  Encoders
exist so the deterministic synthetic media table carries REAL payloads
the decoders round-trip bit-for-bit (tests/test_multimodal.py).
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np


# ---------------------------------------------------------------------------
# PPM (P6)
# ---------------------------------------------------------------------------

def encode_ppm(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> binary P6 PPM bytes."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape} {arr.dtype}")
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def decode_ppm_at(payload: bytes, pos: int = 0) -> Tuple[np.ndarray, int]:
    """Parse ONE P6 frame starting at ``pos``; returns (frame, next_pos).
    Handles comment lines and any whitespace run between header tokens
    (the Netpbm grammar)."""
    if payload[pos:pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos += 2
    n = len(payload)
    vals = []
    while len(vals) < 3:
        # skip whitespace and '#' comment lines
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if pos >= n:
            raise ValueError("truncated PPM header")
        if payload[pos:pos + 1] == b"#":
            nl = payload.find(b"\n", pos)
            if nl < 0:
                raise ValueError("truncated PPM header")
            pos = nl + 1
            continue
        end = pos
        while end < n and not payload[end:end + 1].isspace():
            end += 1
        if end == pos or end >= n:
            # empty token, or a header token running into end-of-buffer
            raise ValueError("truncated PPM header")
        vals.append(int(payload[pos:end]))
        pos = end
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    pos += 1                              # single whitespace after maxval
    if len(payload) - pos < h * w * 3:
        raise ValueError("truncated PPM pixel data")
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return data.reshape(h, w, 3), pos + h * w * 3


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 PPM -> (H, W, 3) uint8 (first frame of the payload)."""
    arr, _ = decode_ppm_at(payload)
    return arr


# ---------------------------------------------------------------------------
# PPM stream ("uncompressed video": concatenated P6 frames, the Netpbm
# analogue of a raw MJPEG stream — each frame is a complete P6 image)
# ---------------------------------------------------------------------------

def encode_ppm_stream(frames) -> bytes:
    """list[(H, W, 3) uint8] -> concatenated P6 frames."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(payload: bytes):
    """Concatenated P6 frames -> list[(H, W, 3) uint8].  A single-frame
    payload is a 1-element stream (plain PPM is the degenerate case);
    whitespace between/after frames is tolerated, truncation raises."""
    frames = []
    pos = 0
    n = len(payload)
    while pos < n:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if pos >= n:
            break
        arr, pos = decode_ppm_at(payload, pos)
        frames.append(arr)
    return frames


# ---------------------------------------------------------------------------
# BMP (24-bit, BITMAPINFOHEADER, uncompressed)
# ---------------------------------------------------------------------------

def encode_bmp24(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit uncompressed BMP bytes (bottom-up
    BGR rows, stride padded to 4)."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape} {arr.dtype}")
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)   # flip + BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return header + info + data


def decode_bmp24(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride,
                         offset=off).reshape(h, stride)
    img = rows[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]       # BGR -> RGB
    return img[::-1] if bottom_up else img


# ---------------------------------------------------------------------------
# WAV (RIFF, PCM16)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """1-D int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(
            f"expected 1-D int16 samples, got {samples.shape} {samples.dtype}"
        )
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono -> (int16 samples, sample_rate).  Walks the
    chunk list (tolerates extra chunks before/after fmt/data)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    sample_rate = None
    samples = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        clen = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from(
                "<HHI", payload, pos + 8
            )
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(payload, dtype="<i2", count=clen // 2,
                                    offset=pos + 8)
        pos += 8 + clen + (clen & 1)      # chunks are word-aligned
    if sample_rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    return samples, sample_rate


# ---------------------------------------------------------------------------
# PNG (8-bit gray / RGB / RGBA, non-interlaced)
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: fixed zlib level so encode output is deterministic across runs
_PNG_ZLIB_LEVEL = 6


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> PNG bytes: truecolor (color type 2), bit depth
    8, no interlace, filter 0 on every scanline, one stdlib-zlib IDAT."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError(f"expected (H, W, 3) uint8, got {arr.shape} {arr.dtype}")
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), arr.reshape(h, w * 3)], axis=1
    ).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw, _PNG_ZLIB_LEVEL))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (H, W, 3) uint8.

    Real decode: chunk walk, stdlib ``zlib`` inflate of the concatenated
    IDATs, then the five scanline filters (None/Sub/Up/Average/Paeth)
    un-applied per row — Sub is a per-channel mod-256 prefix sum (numpy
    cumsum); Average/Paeth carry a left-pixel dependency and run as a
    per-byte loop within the (rare) rows that use them.  Supports bit
    depth 8, color types 0 (gray, replicated to RGB), 2 (RGB) and 6
    (RGBA, alpha dropped), no interlace; anything else raises."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = []
    w = hh = ctype = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, hh, depth, ctype, _comp, _filt, inter = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or inter != 0 or ctype not in (0, 2, 6):
                raise ValueError(
                    f"unsupported PNG shape: depth={depth} colortype={ctype} "
                    f"interlace={inter} (8-bit gray/RGB/RGBA only)"
                )
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    buf = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(buf) != hh * (stride + 1):
        raise ValueError("PNG scanline payload has the wrong size")
    buf = buf.reshape(hh, stride + 1)
    out = np.empty((hh, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(hh):
        f = int(buf[y, 0])
        line = buf[y, 1:]
        if f == 0:                                   # None
            rec = line.copy()
        elif f == 1:                                 # Sub: prefix sum
            rec = (
                line.reshape(w, ch).astype(np.uint32).cumsum(axis=0)
            ).astype(np.uint8).reshape(stride)
        elif f == 2:                                 # Up
            rec = line + prev                        # uint8 wraps = mod 256
        elif f == 3:                                 # Average
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                left = int(rec[x - ch]) if x >= ch else 0
                rec[x] = (int(line[x]) + (left + int(prev[x])) // 2) & 0xFF
        elif f == 4:                                 # Paeth
            rec = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                rec[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.reshape(hh, w, ch)
    if ch == 1:
        return np.repeat(img, 3, axis=2)
    if ch == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img


# ---------------------------------------------------------------------------
# GIF (87a/89a): palette + LZW — a REAL compressed video-ish container
# decodable with zero codec libraries (the GIF89a spec's Appendix-F LZW
# is ~60 lines of integer code).  Animated GIF is the one true
# compressed ANIMATION format this environment can round-trip, so the
# frame-sampling video path runs over a genuinely compressed container,
# not just raw PPM streams.
# ---------------------------------------------------------------------------

_GIF_MAX_CODES = 4096          # 12-bit LZW ceiling (GIF89a Appendix F)


def _gif_lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW over palette indices.  Spec'd choices shared with
    the decoder (and the oracle's independent reimplementation): CLEAR
    emitted first; code width = mcs+1 growing when the next free code
    reaches 2^width (cap 12); table reset via CLEAR when full;
    LSB-first bit packing."""
    clear = 1 << mcs
    eoi = clear + 1
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict = {}
    next_code = eoi + 1
    emit(clear)
    prefix = -1
    for sym in indices:
        sym = int(sym)
        if prefix < 0:
            prefix = sym
            continue
        key = (prefix << 8) | sym
        cur = table.get(key)
        if cur is not None:
            prefix = cur
            continue
        emit(prefix)
        table[key] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code == _GIF_MAX_CODES:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            width = mcs + 1
        prefix = sym
    if prefix >= 0:
        emit(prefix)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_lzw_decode(data: bytes, mcs: int) -> bytes:
    """Inverse of ``_gif_lzw_encode`` incl. the KwKwK (code == next
    free slot) case; tolerates a full table until the next CLEAR."""
    clear = 1 << mcs
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    table = list(base)
    width = mcs + 1
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    prev: bytes | None = None
    while True:
        while nbits < width:
            if pos >= len(data):
                return bytes(out)          # missing EOI: emit what we have
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        n_assigned = len(table) + 2        # + clear + eoi slots
        if prev is None:
            if code >= len(base):
                raise ValueError("LZW: first code after CLEAR not literal")
            entry = table[code]
        elif code < clear:
            entry = table[code]
        elif code - 2 < len(table):        # codes above eoi map past base
            entry = table[code - 2]
        elif code - 2 == len(table):
            entry = prev + prev[:1]        # KwKwK
        else:
            raise ValueError(f"LZW: code {code} beyond table")
        if prev is not None and n_assigned < _GIF_MAX_CODES:
            table.append(prev + entry[:1])
            # the decoder's table trails the encoder's by exactly one
            # entry, so it must widen one assignment EARLY to read the
            # encoder's first (width+1)-bit code at the right width
            if n_assigned + 1 == (1 << width) - 1 and width < 12:
                width += 1
        out += entry
        prev = entry


def _gif_palette(frames) -> np.ndarray:
    """Ascending packed-RGB palette over ALL frames (<= 256 colors or
    ValueError — GIF is a palette format; callers quantize first)."""
    packed = np.unique(np.concatenate([
        (f[:, :, 0].astype(np.int64) << 16)
        | (f[:, :, 1].astype(np.int64) << 8)
        | f[:, :, 2].astype(np.int64)
        for f in frames
    ], axis=None))
    if len(packed) > 256:
        raise ValueError(f"GIF palette overflow: {len(packed)} colors > 256")
    return packed


def encode_gif(frames, delay_ms: int = 0) -> bytes:
    """(H, W, 3) uint8 frame list -> GIF89a bytes.

    One global color table (ascending packed RGB over all frames, padded
    to a power-of-two size), no local tables, no interlace; animated
    payloads (>1 frame) carry one Graphic Control Extension per frame
    with ``delay_ms`` rounded to centiseconds."""
    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w, c = frames[0].shape
    if c != 3 or any(f.shape != (h, w, 3) for f in frames):
        raise ValueError("all frames must share one (H, W, 3) shape")
    palette = _gif_palette(frames)
    size_bits = 1
    while (1 << size_bits) < len(palette):
        size_bits += 1
    n_entries = 1 << size_bits
    mcs = max(2, size_bits)
    gct = np.zeros((n_entries, 3), dtype=np.uint8)
    gct[: len(palette), 0] = (palette >> 16) & 0xFF
    gct[: len(palette), 1] = (palette >> 8) & 0xFF
    gct[: len(palette), 2] = palette & 0xFF
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | ((size_bits - 1) << 4) | (size_bits - 1), 0, 0])
    out += gct.tobytes()
    animated = len(frames) > 1
    for f in frames:
        if animated:
            out += bytes([0x21, 0xF9, 0x04, 0x00])
            out += struct.pack("<H", delay_ms // 10)
            out += bytes([0x00, 0x00])
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        packed = ((f[:, :, 0].astype(np.int64) << 16)
                  | (f[:, :, 1].astype(np.int64) << 8)
                  | f[:, :, 2].astype(np.int64)).ravel()
        idx = np.searchsorted(palette, packed).astype(np.int64)
        out.append(mcs)
        lzw = _gif_lzw_encode(idx, mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i:i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def decode_gif(payload: bytes):
    """GIF bytes -> list of (H, W, 3) uint8 frames (global-color-table,
    non-interlaced subset — exactly what ``encode_gif`` emits; local
    color tables or interlace raise).  Truncated or structurally corrupt
    payloads raise ValueError (never IndexError/hang) so actor-pool
    callers can apply the same stub-or-raise policy as JPEG."""
    try:
        return _decode_gif_inner(payload)
    except (IndexError, struct.error) as e:
        raise ValueError(f"truncated or corrupt GIF: {e}") from e


def _decode_gif_inner(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(payload) < 13:
        raise ValueError("truncated GIF header")
    w, h = struct.unpack("<HH", payload[6:10])
    packed_field = payload[10]
    pos = 13
    palette = None
    if packed_field & 0x80:
        n_entries = 2 << (packed_field & 0x07)
        raw = np.frombuffer(payload[pos:pos + 3 * n_entries], np.uint8)
        palette = raw.reshape(n_entries, 3)
        pos += 3 * n_entries
    frames = []
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                  # trailer
            break
        if block == 0x21:                  # extension: skip sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", payload[pos:pos + 8])
        flags = payload[pos + 8]
        pos += 9
        if flags & 0x80:
            raise ValueError("local color tables unsupported")
        if palette is None:
            raise ValueError("GIF without a global color table")
        mcs = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos]:
            n = payload[pos]
            lzw += payload[pos + 1:pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = np.frombuffer(_gif_lzw_decode(bytes(lzw), mcs), np.uint8)
        if len(idx) != fw * fh:
            raise ValueError(
                f"LZW index count {len(idx)} != {fw}x{fh} frame")
        frame = palette[idx].reshape(fh, fw, 3)
        if flags & 0x40:
            # interlaced: rows arrive in the four GIF89a passes
            # (every 8th from 0, every 8th from 4, every 4th from 2,
            # every 2nd from 1) — invert the permutation
            order = np.concatenate([
                np.arange(0, fh, 8), np.arange(4, fh, 8),
                np.arange(2, fh, 4), np.arange(1, fh, 2),
            ])
            out = np.empty_like(frame)
            out[order] = frame
            frame = out
        frames.append(frame.copy())
    return frames


# ---------------------------------------------------------------------------
# magic sniffing
# ---------------------------------------------------------------------------

#: compressed formats that genuinely require codec libraries (PNG and
#: JPEG do NOT belong here anymore: PNG's inflate is stdlib zlib and
#: baseline JPEG is an 8x8 DCT + Annex K Huffman tables — both decoded
#: for real; JPEG lives in ``functions/jpeg.py``)
COMPRESSED_MAGIC = {
    b"ID3": "mp3",
    b"\x00\x00\x00\x18ftyp": "mp4",
    b"\x00\x00\x00\x20ftyp": "mp4",
}


def sniff(payload: bytes) -> str:
    """Container id for a payload: 'ppm' | 'bmp' | 'wav' | 'png' |
    'jpeg' | 'gif' | a compressed format name | 'unknown'."""
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    for magic, name in COMPRESSED_MAGIC.items():
        if payload[: len(magic)] == magic:
            return name
    return "unknown"
