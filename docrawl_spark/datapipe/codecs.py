"""Stdlib-only media codecs: REAL decode paths for the formats Python
can handle without PIL/ffmpeg — PNG (zlib + the five PNG filters), BMP
(uncompressed BI_RGB), and WAV PCM (the ``wave`` module) — plus a real
PNG encoder and nearest-neighbor resampler.

These give the multimodal stages (``datapipe/multimodal.py``) genuine
decode legs in this container (reference behavior: O17 downloads image
bytes, docrawl_core.py:782-836); JPEG/video stay cluster-only
(libjpeg/ffmpeg) and keep their NotImplementedError + deterministic
fakes. Everything here is per-row compute inside Arrow-batched
mapInPandas workers — no Spark shuffle implications; production hot
paths on a cluster should still prefer libjpeg-turbo for JPEG volume,
but PNG/BMP/WAV correctness does not need any wheel.

Decoder limits (asserted, not silently wrong): PNG bit depth 8,
interlace 0 (Adam7 rejected), color types 0/2/3/4/6; BMP 24/32-bit
BI_RGB; WAV PCM 8/16-bit. Unsupported inputs raise ValueError with the
offending field named.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "parse_png",
    "png_bytes",
    "parse_bmp",
    "parse_wav",
    "wav_bytes",
    "mean_luma",
    "resize_nearest",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (spec §9): returns (height, width*bpp)
    uint8. Filters 0/1/2 vectorize (sub is a per-channel cumsum);
    3/4 are inherently sequential and loop per byte."""
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != {height}x({stride}+1)"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1)
        pos += stride + 1
        if ftype == 0:
            cur = line.copy()
        elif ftype == 1:  # Sub: prefix sum over pixels, per channel
            cur = (
                line.reshape(width, bpp).astype(np.uint64).cumsum(axis=0) % 256
            ).astype(np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            cur = line + prev  # uint8 wraps mod 256
        elif ftype == 3:  # Average
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + (left + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = np.zeros(stride, dtype=np.uint8)
            for i in range(stride):
                left = int(cur[i - bpp]) if i >= bpp else 0
                up = int(prev[i])
                ul = int(prev[i - bpp]) if i >= bpp else 0
                cur[i] = (int(line[i]) + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur
        prev = cur
    return out


def parse_png(data: bytes) -> np.ndarray:
    """Full PNG decode → (H, W, C) uint8 (C per color type; palette
    expands to RGB). Bit depth 8, interlace 0 only — others raise."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = bit_depth = color_type = interlace = None
    idat = bytearray()
    palette: bytes | None = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"PLTE":
            palette = bytes(body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"PNG bit depth {bit_depth} unsupported (8 only)")
    if interlace != 0:
        raise ValueError("PNG Adam7 interlace unsupported")
    if color_type not in _PNG_CHANNELS:
        raise ValueError(f"PNG color type {color_type} invalid")
    bpp = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, width, height, bpp).reshape(height, width, bpp)
    if color_type == 3:
        if palette is None:
            raise ValueError("PNG palette image missing PLTE")
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, 3)
        px = pal[px[:, :, 0]]
    return px


def png_bytes(pixels: np.ndarray) -> bytes:
    """Minimal real PNG encoder: (H, W) gray or (H, W, 3|4) uint8,
    filter 0 scanlines, one zlib IDAT. Output round-trips through
    :func:`parse_png` and any standards-compliant viewer."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = bytearray()
    for y in range(h):
        raw.append(0)
        raw.extend(px[y].tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


def parse_bmp(data: bytes) -> np.ndarray:
    """Uncompressed BI_RGB 24/32-bit BMP → (H, W, 3) uint8 (BGR→RGB,
    bottom-up rows flipped, row padding stripped)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP (bad signature)")
    (off,) = struct.unpack("<I", data[10:14])
    (hdr_size,) = struct.unpack("<I", data[14:18])
    if hdr_size < 40:
        raise ValueError(f"BMP header size {hdr_size} unsupported")
    width, height = struct.unpack("<ii", data[18:26])
    planes, bitcount = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if compression != 0:
        raise ValueError(f"BMP compression {compression} unsupported (BI_RGB only)")
    if bitcount not in (24, 32):
        raise ValueError(f"BMP bit count {bitcount} unsupported (24/32 only)")
    bottom_up = height > 0
    height = abs(height)
    nbytes = bitcount // 8
    stride = (width * nbytes + 3) & ~3
    px = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        row = np.frombuffer(data, np.uint8, count=width * nbytes, offset=off + y * stride)
        row = row.reshape(width, nbytes)
        py = height - 1 - y if bottom_up else y
        px[py] = row[:, [2, 1, 0]]  # BGR(A) -> RGB
    return px


def parse_wav(data: bytes) -> tuple[int, int, float]:
    """WAV PCM decode via the stdlib ``wave`` module →
    (duration_ms, sample_rate, rms) with rms normalized to [0, 1]."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        frames = w.readframes(n)
    if sw == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise ValueError(f"WAV sample width {sw} unsupported (PCM 8/16-bit only)")
    rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
    duration_ms = int(round(n * 1000 / rate)) if rate else 0
    return duration_ms, rate, rms


def wav_bytes(samples: np.ndarray, sample_rate: int, n_channels: int = 1) -> bytes:
    """PCM-16 WAV encoder (test fixtures / synthetic corpora):
    float samples in [-1, 1] → real RIFF/WAVE bytes."""
    s16 = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    s16 = (s16 * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(s16.tobytes())
    return buf.getvalue()


def mean_luma(px: np.ndarray) -> float:
    """Rec.601 mean luma in [0, 1]; gray/gray+alpha use the gray
    channel, RGB(A) the weighted sum (alpha ignored — luma of the
    stored pixels, not composited)."""
    px = np.asarray(px, dtype=np.float64)
    if px.ndim == 2 or px.shape[2] <= 2:
        y = px[:, :, 0] if px.ndim == 3 else px
    else:
        y = 0.299 * px[:, :, 0] + 0.587 * px[:, :, 1] + 0.114 * px[:, :, 2]
    return float(y.mean()) / 255.0


def resize_nearest(px: np.ndarray, max_side: int) -> np.ndarray:
    """Aspect-preserving nearest-neighbor downscale so
    max(H, W) <= max_side (no-op when already within bounds)."""
    h, w = px.shape[:2]
    scale = min(1.0, max_side / max(h, w))
    if scale >= 1.0:
        return px
    oh, ow = max(1, int(h * scale)), max(1, int(w * scale))
    ys = (np.arange(oh) * (h / oh)).astype(np.int64)
    xs = (np.arange(ow) * (w / ow)).astype(np.int64)
    return px[ys][:, xs]
