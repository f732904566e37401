"""Minimal pure-Python PNG codec (zlib only — no Pillow/cv2 in this
container). Enough of the spec (ISO/IEC 15948) for real round-trips:

  decode: 8-bit grayscale (color type 0) and 8-bit RGB (color type 2),
          all five scanline filters (None/Sub/Up/Average/Paeth),
          multi-IDAT streams, non-interlaced
  encode: 8-bit grayscale, filter 0

This replaces the image-codec stub in operators/multimodal.py for PNG
payloads: `media_metadata` / `frame_sample_features` / texture stats
run on real image bytes end to end (the reference loads scans via
cv2.imread, OCR/src/detect.py:122-128).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png_gray(grid: np.ndarray) -> bytes:
    """8-bit grayscale, filter type 0 on every scanline."""
    if grid.dtype != np.uint8 or grid.ndim != 2:
        raise ValueError("encode_png_gray wants a 2-D uint8 array")
    h, w = grid.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + grid[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def encode_png_rgb(img: np.ndarray) -> bytes:
    """8-bit RGB, filter type 0 on every scanline. img: (h, w, 3)."""
    if img.dtype != np.uint8 or img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png_rgb wants an (h, w, 3) uint8 array")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img[y].tobytes() for y in range(h))
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def is_png(payload: bytes) -> bool:
    return payload[:8] == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array, shape (h, w) for grayscale or
    (h, w, 3) for RGB."""
    if not is_png(payload):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if pos + 12 + length > len(payload):
            # a corrupt payload in a media batch must surface as a codec
            # ValueError, not a struct.error from a short CRC slice
            raise ValueError(f"truncated PNG chunk {tag!r}")
        body = payload[pos + 8 : pos + 8 + length]
        expect = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != expect:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in (0, 2) or interlace != 0:
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace}); this codec handles 8-bit gray/RGB"
        )
    bpp = 1 if color_type == 0 else 3
    stride = width * bpp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG IDAT length mismatch")

    raw_arr = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    if not raw_arr[:, 0].any():
        # all scanlines use filter 0 (this codec's own encoder output,
        # and common for synthetic/flat images): no per-row work at all
        out = np.ascontiguousarray(raw_arr[:, 1:])
        return out if bpp == 1 else out.reshape(height, width, 3)

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        if f == 0:  # None
            cur = line
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 1:
            # Sub is a per-lane prefix sum mod 256 (cur[i] = line[i] +
            # cur[i-bpp]): vectorized as a cumsum within each bpp lane —
            # the hot filter on real encoders, so no per-pixel Python
            cur = np.empty(stride, dtype=np.int64)
            for lane in range(bpp):
                cur[lane::bpp] = np.cumsum(line[lane::bpp]) & 0xFF
        elif f in (3, 4):
            # Average/Paeth are genuinely left-sequential recurrences
            # (floor-division / predictor selection break prefix-sum
            # form), so they stay per-pixel Python — a documented
            # limitation for megapixel scans from aggressive encoders;
            # None/Up/Sub (the common cases) are fully vectorized.
            cur = np.zeros(stride, dtype=np.int64)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if f == 3:
                    cur[i] = (line[i] + (a + b) // 2) & 0xFF
                else:
                    cur[i] = (line[i] + _paeth(int(a), int(b), int(c))) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out if bpp == 1 else out.reshape(height, width, 3)
