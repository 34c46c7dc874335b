"""Minimal pure-Python PNG encode/decode (8-bit RGB, non-interlaced).

The sandbox has no PIL, so the image payload required by the input_hint
(``bytes:binary`` + decoded-pixel verification) uses this codec: a valid,
spec-conformant PNG writer (filter 0, zlib) and a reader for the subset we
emit plus all five standard filter types on read. Deterministic: same pixels
→ same bytes. This is the lossless leg of the payload; lossy (jpeg) decode is
gated behind an optional PIL import in imaging.py and stubbed otherwise.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """RGB uint8 array (h, w, 3) → PNG bytes (color type 2, bit depth 8)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 RGB array")
    h, w = pixels.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # Filter byte 0 per scanline.
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).astype(np.int32)
        pos += stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for i in range(bpp, stride):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → RGB uint8 (h, w, 3). Supports 8-bit RGB/RGBA/gray, filters 0-4."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = 0
    bit_depth = color_type = 0
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            if bit_depth != 8 or interlace != 0:
                raise ValueError("unsupported PNG variant")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"unsupported color type {color_type}")
    raw = zlib.decompress(idat)
    arr = _unfilter(raw, w, h, channels).reshape(h, w, channels)
    if channels == 1:
        arr = np.repeat(arr, 3, axis=2)
    elif channels == 4:
        arr = arr[:, :, :3]
    return arr


def phash64(pixels: np.ndarray) -> int:
    """64-bit difference hash (dHash) of an RGB array — signed long.

    Grayscale → area-resample to 9×8 → horizontal gradient sign bits.
    Deterministic pure-numpy stand-in for a perceptual hash (reference has no
    image ops; required by input_hint's ``phash:int64`` column).
    """
    gray = pixels.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
    h, w = gray.shape
    if h >= 9 and w >= 10:
        # Box means via two reduceat passes (row segments then column
        # segments) — one vectorized pass instead of 72 python-level
        # slice.mean() calls (the slice form measured 0.8 ms/image, ~4x the
        # PNG decode itself).
        ys0 = np.arange(9) * h // 9
        xs0 = np.arange(10) * w // 10
        # Segment r of reduceat(ys0) spans ys0[r]..ys0[r+1] for r<8 — the
        # original box bounds exactly; the trailing segment (to h / to w) is
        # sliced away.
        row_sums = np.add.reduceat(gray, ys0, axis=0)[:8]
        box_sums = np.add.reduceat(row_sums, xs0, axis=1)[:, :9]
        counts = np.outer(np.diff(ys0), np.diff(xs0)).astype(np.float64)
        small = box_sums / counts
    else:
        ys = (np.arange(9) * h // 9, (np.arange(9) + 1) * h // 9)
        xs = (np.arange(10) * w // 10, (np.arange(10) + 1) * w // 10)
        small = np.empty((8, 9))
        for r in range(8):
            y0, y1 = ys[0][r], max(ys[1][r], ys[0][r] + 1)
            for c in range(9):
                x0, x1 = xs[0][c], max(xs[1][c], xs[0][c] + 1)
                small[r, c] = gray[y0:y1, x0:x1].mean()
    bits = (small[:, 1:] > small[:, :-1]).flatten()
    v = int.from_bytes(np.packbits(bits).tobytes(), "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB between two uint8 images."""
    diff = a.astype(np.float64) - b.astype(np.float64)
    mse = float(np.mean(diff * diff))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0 * 255.0 / mse)
