"""Pure-stdlib media codecs: real PNG / BMP / WAV decode (and encode,
for deterministic test/corpus generation) with no third-party deps.

The container has no PIL/ffmpeg, but PNG is just zlib + per-scanline
unfiltering, BMP (BI_RGB) is a raw pixel grid, and WAV parses with the
stdlib ``wave`` module — so the multimodal stages
(:mod:`patito_ray.functions.multimodal`) can run a REAL decode path for
these containers' worth of formats instead of a hash-derived fake.
JPEG/MP3/video still raise NotImplementedError with a clear message
(they genuinely need PIL/ffmpeg).

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
# Image ops (numpy)


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff + decode PNG/BMP. JPEG raises NotImplementedError (needs a
    real codec library), everything else ValueError."""
    fmt = sniff_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "jpeg":
        raise NotImplementedError(
            "JPEG decode requires PIL/libjpeg (not in this container); "
            "PNG and BMP decode natively"
        )
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
