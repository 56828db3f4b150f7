"""Pure-stdlib media codecs: real PNG / BMP / JPEG / WAV decode (and
encode, for deterministic test/corpus generation) with no third-party
deps.

The container has no PIL/ffmpeg, but PNG is just zlib + per-scanline
unfiltering, BMP (BI_RGB) is a raw pixel grid, WAV parses with the
stdlib ``wave`` module, and baseline-sequential JPEG (the dominant
real-crawl image format) is huffman + IDCT implemented below — so the
multimodal stages (:mod:`patito_ray.functions.multimodal`) run a REAL
decode path for all of them instead of a hash-derived fake.
Progressive JPEG / MP3 / real video containers still raise
NotImplementedError with a clear message (they genuinely need
libjpeg/ffmpeg).

Decoders return ``numpy`` arrays: images as ``(h, w, c) uint8``
(c in {1, 2, 3, 4}), audio as ``(n_samples, n_channels) int16`` plus a
sample rate. Encoders are the exact inverses used by the tests to
round-trip real bytes.

Scale note: these run inside actor-pool ``map_batches`` stages over
SMALL batches (payload bytes dominate memory — see
``multimodal.MEDIA_BATCH_SIZE``); the per-image Python scanline loop is
the irreducible decode cost a C codec would also pay, just faster.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def sniff_format(payload: bytes) -> str:
    """Best-effort container sniff from magic bytes."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    return "unknown"


# --------------------------------------------------------------------------
# PNG


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over one pixel's channels."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_ = np.abs(p - a)
    pb = np.abs(p - b)
    pc_ = np.abs(p - c)
    return np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c)).astype(
        np.uint8
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG (gray / gray+alpha / RGB /
    RGBA) to ``(h, w, c) uint8``. Unsupported variants (16-bit,
    palette, interlaced) raise ``ValueError`` with the reason."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    n = len(payload)
    while pos + 8 <= n:
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported PNG bit depth {bit_depth} (only 8)")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"unsupported PNG color type {color_type} (palette?)")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    lines = raw.reshape(height, stride + 1)
    ftypes = lines[:, 0]
    # fast paths for uniform filters (encoders commonly pick one filter
    # for the whole image; ours always writes 0)
    if not ftypes.any():  # all None: rows are the raw bytes
        return np.ascontiguousarray(lines[:, 1:]).reshape(height, width, channels)
    if (ftypes == 2).all():  # all Up: column-wise cumulative sum mod 256
        out = np.cumsum(lines[:, 1:], axis=0, dtype=np.uint64) % 256
        return out.astype(np.uint8).reshape(height, width, channels)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = int(lines[y, 0])
        line = lines[y, 1:]
        up = out[y - 1] if y else np.zeros(stride, np.uint8)
        if ftype == 0:  # None
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + up
        elif ftype == 1:  # Sub: recon[i] = raw[i] + recon[i-bpp]
            # per-channel cumulative sum mod 256 over the pixel axis
            px = line.reshape(width, bpp).astype(np.uint64)
            out[y] = (
                np.cumsum(px, axis=0, dtype=np.uint64) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 3:  # Average
            rec = out[y]
            prev = np.zeros(bpp, np.uint8)
            lp = line.reshape(width, bpp)
            upx = up.reshape(width, bpp)
            for x in range(width):
                prev = (
                    lp[x]
                    + ((prev.astype(np.uint16) + upx[x].astype(np.uint16)) >> 1).astype(
                        np.uint8
                    )
                )
                rec[x * bpp : (x + 1) * bpp] = prev
        elif ftype == 4:  # Paeth
            rec = out[y]
            prev = np.zeros(bpp, np.uint8)
            prev_up = np.zeros(bpp, np.uint8)
            lp = line.reshape(width, bpp)
            upx = up.reshape(width, bpp)
            for x in range(width):
                prev = lp[x] + _paeth(prev, upx[x], prev_up)
                prev_up = upx[x]
                rec[x * bpp : (x + 1) * bpp] = prev
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """Encode ``(h, w)`` or ``(h, w, c) uint8`` to PNG (filter 0)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    scan = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * c)], axis=1
    )
    idat = zlib.compress(scan.tobytes(), 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# BMP (uncompressed BI_RGB, 24/32-bit)


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BI_RGB BMP to ``(h, w, c) uint8``
    (RGB channel order; alpha kept for 32-bit)."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    (bpp,) = struct.unpack_from("<H", payload, 28)
    (compression,) = struct.unpack_from("<I", payload, 30)
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported BMP bit depth {bpp}")
    top_down = height < 0
    height = abs(height)
    nch = bpp // 8
    row_bytes = (width * nch + 3) & ~3
    px = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * height, offset=data_off
    ).reshape(height, row_bytes)[:, : width * nch]
    img = px.reshape(height, width, nch)
    if not top_down:
        img = img[::-1]
    # BGR(A) -> RGB(A)
    if nch == 3:
        img = img[:, :, ::-1]
    else:
        img = img[:, :, [2, 1, 0, 3]]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """Encode ``(h, w, 3) uint8`` RGB to a 24-bit BI_RGB BMP."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp expects (h, w, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    data = rows.tobytes()
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0)
    return header + dib + data


# --------------------------------------------------------------------------
# WAV (PCM, via stdlib wave)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV bytes to ``((n_samples, n_channels) int16,
    sample_rate)``. 8-bit PCM is widened to int16."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        frames = w.readframes(w.getnframes())
    if sw == 2:
        samples = np.frombuffer(frames, dtype="<i2")
    elif sw == 1:  # unsigned 8-bit -> int16
        samples = (
            (np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128) << 8
        )
    else:
        raise ValueError(f"unsupported WAV sample width {sw} bytes")
    return samples.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Encode ``(n, ch) int16`` PCM to WAV bytes."""
    import io
    import wave

    samples = np.ascontiguousarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


# --------------------------------------------------------------------------
# JPEG (baseline sequential DCT, JFIF) — pure numpy + stdlib.
#
# Real crawls are JPEG-dominant, so the image stages need a native
# decode path. This is a from-scratch baseline codec (ITU T.81):
# decoder handles SOF0 (8-bit, 1 or 3 components, any sampling factors
# incl. 4:2:0/4:2:2/4:4:4), tables read from the file's DQT/DHT,
# restart markers, and batches the IDCT over all blocks per component
# with one einsum; progressive (SOF2) / arithmetic / 12-bit raise
# NotImplementedError with the reason. The encoder (tests + corpus
# generation) emits Annex-K tables at a quality setting, 4:4:4 or
# 4:2:0. Entropy decode is a Python per-symbol loop over a 16-bit
# peek LUT (canonical JPEG codes are <= 16 bits -> one dict-free
# lookup per symbol); everything after entropy decode is vectorized.

#: natural-order (row*8+col) index of the k-th zigzag coefficient
_ZZ = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantization tables (natural order), quality-scaled at encode
_Q_LUMA = np.array(
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
_Q_CHROMA = np.array(
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

# Annex K huffman specs: (bits[1..16] code-length histogram, values)
_HUFF_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_HUFF_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
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
    ],
)
_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
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
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: D[k, n] = c(k)/2 * cos((2n+1) k pi / 16);
# forward F = D f D^T, inverse f = D^T F D (orthonormal)
_DCT_D = np.zeros((8, 8), dtype=np.float64)
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    _DCT_D[_k] = _c * np.cos((2 * np.arange(8) + 1) * _k * np.pi / 16)
del _k, _c


def _canonical_codes(bits: "list[int]") -> "list[tuple[int, int]]":
    """(code, length) per symbol in spec order from the 16-entry
    code-length histogram (T.81 C.2 canonical assignment)."""
    out = []
    code = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((code, ln))
            code += 1
        code <<= 1
    return out


def _decode_lut(bits: "list[int]", values: "list[int]") -> np.ndarray:
    """65536-entry LUT: 16-bit peek -> (symbol << 5) | code_length.
    One array index per decoded symbol, no bit-by-bit tree walk."""
    lut = np.zeros(1 << 16, dtype=np.uint16)
    for (code, ln), sym in zip(_canonical_codes(bits), values):
        lo = code << (16 - ln)
        hi = lo + (1 << (16 - ln))
        lut[lo:hi] = (sym << 5) | ln
    return lut


class _BitReader:
    """Entropy-segment bit reader: handles 0xFF00 byte stuffing and
    surfaces RSTn markers (returned as events, consumed by the MCU
    loop to reset DC predictors)."""

    __slots__ = ("data", "pos", "buf", "cnt", "_marker")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.cnt = 0
        self._marker: int | None = None

    def _fill(self) -> None:
        data, pos = self.data, self.pos
        while self.cnt <= 48:
            if pos >= len(data) or self._marker is not None:
                # pad with 1s past the end (T.81 F.2.2.5 allows it)
                self.buf = (self.buf << 8) | 0xFF
                self.cnt += 8
                continue
            b = data[pos]
            pos += 1
            if b == 0xFF:
                nxt = data[pos] if pos < len(data) else 0xD9
                if nxt == 0x00:
                    pos += 1  # stuffed literal 0xFF
                else:
                    self._marker = nxt  # RSTn / EOI / next segment
                    self.buf = (self.buf << 8) | 0xFF
                    self.cnt += 8
                    continue
            self.buf = (self.buf << 8) | b
            self.cnt += 8
        self.pos = pos

    def peek16(self) -> int:
        if self.cnt < 16:
            self._fill()
        return (self.buf >> (self.cnt - 16)) & 0xFFFF

    def skip(self, n: int) -> None:
        self.cnt -= n
        self.buf &= (1 << self.cnt) - 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.cnt < n:
            self._fill()
        v = (self.buf >> (self.cnt - n)) & ((1 << n) - 1)
        self.skip(n)
        return v

    def restart(self) -> int | None:
        """Byte-align and consume a pending RSTn; returns its index."""
        self.buf = 0
        self.cnt = 0
        m = self._marker
        if m is None or not (0xD0 <= m <= 0xD7):
            raise ValueError("expected JPEG restart marker")
        self._marker = None
        self.pos += 1  # past the marker byte (0xFF already consumed)
        return m - 0xD0


def _extend(v: int, size: int) -> int:
    """T.81 F.12 sign extension of a magnitude-coded value."""
    return v - ((1 << size) - 1) if v < (1 << (size - 1)) else v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline-sequential JFIF/EXIF JPEG to ``(h, w, c)
    uint8`` (c=3 RGB, or 1 for grayscale files). Progressive (SOF2),
    arithmetic coding and 12-bit precision raise NotImplementedError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], np.ndarray] = {}  # (class, id) -> LUT
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    pos = 2
    n = len(payload)
    scan_comps: list[dict] = []
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("corrupt JPEG marker stream")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        seg = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq:
                    raise NotImplementedError("16-bit JPEG quant tables")
                tab = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                nat = np.empty(64, np.int32)
                nat[_ZZ] = tab  # stored in zigzag order
                qt[tq] = nat
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(seg[p + 17 : p + 17 + nv])
                huff[(tc, th)] = _decode_lut(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG precision")
            height, width = struct.unpack_from(">HH", seg, 1)
            nc = seg[5]
            comps = []
            for k in range(nc):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) is supported "
                f"(got SOF marker 0x{marker:02X}; progressive needs a "
                "full codec library)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = seg[0]
            scan_comps = []
            for k in range(ns):
                cid, tt = seg[1 + 2 * k : 3 + 2 * k]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": huff[(0, tt >> 4)], "ac": huff[(1, tt & 15)]}
                )
            break  # pos now points at entropy-coded data
        # other markers (APPn, COM) are skipped
    if not scan_comps or not width:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    for c in scan_comps:
        c["bw"] = mcux * c["h"]  # blocks per row
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
        c["q"] = qt[c["tq"]]
        c["pred"] = 0

    rd = _BitReader(payload, pos)
    zz = _ZZ
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                rd.restart()
                for c in scan_comps:
                    c["pred"] = 0
            mcu_count += 1
            for c in scan_comps:
                dc_lut, ac_lut = c["dc"], c["ac"]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][
                            (my * c["v"] + by) * c["bw"] + mx * c["h"] + bx
                        ]
                        e = dc_lut[rd.peek16()]
                        if not e:
                            raise ValueError("invalid JPEG huffman code (DC)")
                        rd.skip(e & 31)
                        size = e >> 5
                        diff = _extend(rd.receive(size), size) if size else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            e = ac_lut[rd.peek16()]
                            if not e:
                                raise ValueError("invalid JPEG huffman code (AC)")
                            rd.skip(e & 31)
                            sym = e >> 5
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL: 16 zeros
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            size = sym & 15
                            blk[zz[k]] = _extend(rd.receive(size), size)
                            k += 1

    # batch dequantize + IDCT per component (one einsum over all blocks)
    planes = []
    for c in scan_comps:
        coefs = (c["coef"] * c["q"][None, :]).reshape(-1, 8, 8).astype(np.float64)
        spatial = np.einsum("ki,nkl,lj->nij", _DCT_D, coefs, _DCT_D, optimize=True)
        spatial = np.clip(np.round(spatial) + 128, 0, 255).astype(np.uint8)
        # blocks -> plane
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        # upsample to full resolution (sample replication), crop
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        planes.append(plane[:height, :width])

    if len(planes) == 1:
        return planes[0][:, :, None].copy()
    y, cb, cr = (p.astype(np.float64) for p in planes)
    r = y + 1.402 * (cr - 128)
    g = y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128)
    b = y + 1.772 * (cb - 128)
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _encode_huff_maps(bits, values):
    """symbol -> (code, length) dict for the encoder side."""
    return {
        sym: cl for cl, sym in zip(_canonical_codes(bits), values)
    }


class _BitWriter:
    __slots__ = ("out", "buf", "cnt")

    def __init__(self) -> None:
        self.out = bytearray()
        self.buf = 0
        self.cnt = 0

    def write(self, code: int, length: int) -> None:
        self.buf = (self.buf << length) | code
        self.cnt += length
        while self.cnt >= 8:
            b = (self.buf >> (self.cnt - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.cnt -= 8
        self.buf &= (1 << self.cnt) - 1

    def flush(self) -> None:
        if self.cnt:
            pad = 8 - self.cnt
            self.write(((1 << pad) - 1), pad)  # pad with 1s


def _quality_scale(q_base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q_base * scale + 50) // 100, 1, 255).astype(np.int32)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (n_blocks, 64) DCT coeffs,
    blocks in row-major order. H, W must be multiples of 8."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    out = np.einsum("ik,nkl,jl->nij", _DCT_D, blocks, _DCT_D, optimize=True)
    return out.reshape(-1, 64)


def _encode_component_blocks(
    wr: "_BitWriter",
    blocks_zz: np.ndarray,
    order: np.ndarray,
    pred: int,
    dc_map: dict,
    ac_map: dict,
) -> int:
    """Entropy-encode quantized zigzag blocks (selected row order)."""
    for bi in order:
        blk = blocks_zz[bi]
        dc = int(blk[0])
        diff = dc - pred
        pred = dc
        size = int(diff if diff >= 0 else -diff).bit_length()
        code, ln = dc_map[size]
        wr.write(code, ln)
        if size:
            v = diff if diff >= 0 else diff + (1 << size) - 1
            wr.write(v & ((1 << size) - 1), size)
        nz = np.flatnonzero(blk[1:])  # positions (0-based within AC)
        k_prev = 0
        for p_ in nz:
            run = int(p_) - k_prev
            k_prev = int(p_) + 1
            while run >= 16:
                code, ln = ac_map[0xF0]
                wr.write(code, ln)
                run -= 16
            v = int(blk[1 + p_])
            size = int(v if v >= 0 else -v).bit_length()
            code, ln = ac_map[(run << 4) | size]
            wr.write(code, ln)
            vv = v if v >= 0 else v + (1 << size) - 1
            wr.write(vv & ((1 << size) - 1), size)
        if k_prev < 63:
            code, ln = ac_map[0x00]  # EOB
            wr.write(code, ln)
    return pred


def _pad_edge(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult_y
    pw = (-w) % mult_x
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode ``(h, w, 3) uint8`` RGB (or ``(h, w)``/``(h, w, 1)``
    grayscale) as a baseline JFIF JPEG with Annex-K tables scaled to
    ``quality``. ``subsampling``: "444" or "420" (3-channel only);
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (the error-resilience feature real crawl JPEGs carry)."""
    img = np.asarray(img)
    if img.ndim == 3 and img.shape[2] == 1:
        img = img[:, :, 0]
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    if gray:
        subsampling = "444"

    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "420":
            cb = _pad_edge(cb, 2, 2)
            cr = _pad_edge(cr, 2, 2)
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean(axis=(1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean(axis=(1, 3))
        planes = [y, cb, cr]

    hv = [(2, 2), (1, 1), (1, 1)] if subsampling == "420" else [(1, 1)] * 3
    hmax = max(x for x, _ in hv[: len(planes)])
    vmax = max(x for _, x in hv[: len(planes)])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comp_blocks = []
    for ci, plane in enumerate(planes):
        ch, cv = hv[ci]
        # pad (edge replication) to this component's full MCU grid
        need_h, need_w = 8 * mcuy * cv, 8 * mcux * ch
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        if ph or pw:
            plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
        q = ql if ci == 0 else qc
        coefs = _fdct_blocks(plane - 128.0)
        quant = np.round(coefs / q[None, :]).astype(np.int32)
        zzb = quant[:, _ZZ]
        comp_blocks.append({"zz": zzb, "bw": need_w // 8, "h": ch, "v": cv})

    wr = _BitWriter()
    dc_maps = [_encode_huff_maps(*_HUFF_DC_LUMA), _encode_huff_maps(*_HUFF_DC_CHROMA)]
    ac_maps = [_encode_huff_maps(*_HUFF_AC_LUMA), _encode_huff_maps(*_HUFF_AC_CHROMA)]
    preds = [0] * len(planes)
    mcu_count = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                wr.flush()
                wr.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, cblk in enumerate(comp_blocks):
                tsel = 0 if ci == 0 else 1
                order = [
                    (my * cblk["v"] + by) * cblk["bw"] + mx * cblk["h"] + bx
                    for by in range(cblk["v"])
                    for bx in range(cblk["h"])
                ]
                preds[ci] = _encode_component_blocks(
                    wr, cblk["zz"], np.array(order), preds[ci],
                    dc_maps[tsel], ac_maps[tsel],
                )
    wr.flush()

    # ---- assemble the file
    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_l = np.empty(64, np.uint8)
    zz_l[np.arange(64)] = ql[_ZZ]
    out += seg(0xDB, bytes([0x00]) + zz_l.tobytes())
    if not gray:
        zz_c = np.empty(64, np.uint8)
        zz_c[np.arange(64)] = qc[_ZZ]
        out += seg(0xDB, bytes([0x01]) + zz_c.tobytes())
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        ch, cv = hv[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for (tc, th, (bits, vals)) in (
        (0, 0, _HUFF_DC_LUMA),
        (1, 0, _HUFF_AC_LUMA),
        *(((0, 1, _HUFF_DC_CHROMA), (1, 1, _HUFF_AC_CHROMA)) if not gray else ()),
    ):
        out += seg(0xC4, bytes([(tc << 4) | th] + bits + vals))
    sos = bytes([nc])
    for ci in range(nc):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Image ops (numpy)


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode PNG/BMP/JPEG (all native — see the per-format
    decoders); anything else raises ValueError."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "jpeg":
        return decode_jpeg(payload)
    raise ValueError(f"unrecognized image container (magic={payload[:4]!r})")


def to_gray(img: np.ndarray) -> np.ndarray:
    """(h, w, c) uint8 -> (h, w) float32 luma in [0, 1] (Rec. 601)."""
    f = img.astype(np.float32) / 255.0
    c = img.shape[2]
    if c == 1:
        return f[:, :, 0]
    if c == 2:  # gray + alpha
        return f[:, :, 0]
    return 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resize of ``(h, w[, c])`` float/uint8 via pure numpy
    gather — no per-pixel Python."""
    arr = img.astype(np.float32)
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(np.int64), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(np.int64), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    wy = np.clip(ys - y0, 0.0, 1.0)[:, None]
    wx = np.clip(xs - x0, 0.0, 1.0)[None, :]
    if arr.ndim == 3:
        wy = wy[..., None]
        wx = wx[..., None]
    top = arr[y0][:, x0] * (1 - wx) + arr[y0][:, x1] * wx
    bot = arr[y1][:, x0] * (1 - wx) + arr[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------- video
# Minimal REAL video container ("MPNG" — motion-PNG): a fixed header
# (magic, frame count, fps numerator/denominator) followed by
# length-prefixed PNG frames. Every byte is parseable with the stdlib,
# so the video path exercises true container parsing + per-frame image
# decode without ffmpeg; an ffmpeg/MP4 branch would slot in at
# decode_video_frame unchanged (sniff_format names the library).

_MPNG_MAGIC = b"MPNG"


def encode_mpng(frames: "list[np.ndarray]", fps: int = 10) -> bytes:
    """Encode RGB frames (uint8 HxWx3, equal shapes) as an MPNG blob."""
    import struct

    if not frames:
        raise ValueError("encode_mpng needs at least one frame")
    out = [_MPNG_MAGIC, struct.pack("<II", len(frames), fps)]
    for f in frames:
        png = encode_png(f)
        out.append(struct.pack("<I", len(png)))
        out.append(png)
    return b"".join(out)


def parse_mpng_index(payload: bytes) -> "tuple[int, int, list[tuple[int, int]]]":
    """Container parse ONLY (no pixel decode): returns (n_frames, fps,
    [(offset, length)] per frame). The cheap pass a frame-sampling
    stage runs before touching any pixels."""
    import struct

    if payload[:4] != _MPNG_MAGIC:
        raise ValueError("not an MPNG payload (magic mismatch)")
    n, fps = struct.unpack_from("<II", payload, 4)
    spans = []
    pos = 12
    for _ in range(n):
        (ln,) = struct.unpack_from("<I", payload, pos)
        pos += 4
        spans.append((pos, ln))
        pos += ln
    if pos != len(payload):
        raise ValueError("MPNG payload has trailing bytes (corrupt container)")
    return int(n), int(fps), spans


def decode_video_frame(payload: bytes, offset: int, length: int) -> np.ndarray:
    """Decode ONE frame given its container span (REAL PNG decode)."""
    return decode_image(payload[offset : offset + length])
