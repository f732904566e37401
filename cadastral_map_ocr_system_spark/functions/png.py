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


def _slow_rows_python(lines: np.ndarray, fs: np.ndarray, prev: list, bpp: int):
    """Average/Paeth decode, one row at a time in plain-Python ints
    (lists, no per-element numpy indexing) — the small-block path."""
    rows = []
    for line_b, f in zip(lines, fs):
        cur: list = []
        ap = cur.append
        if f == 3:
            for i, lv in enumerate(line_b.tobytes()):
                a = cur[i - bpp] if i >= bpp else 0
                ap((lv + ((a + prev[i]) >> 1)) & 0xFF)
        else:
            for i, lv in enumerate(line_b.tobytes()):
                a = cur[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                ap((lv + _paeth(a, prev[i], c)) & 0xFF)
        rows.append(cur)
        prev = cur
    return rows


def _decode_avg_paeth_block(
    lines: np.ndarray, fs: np.ndarray, prev_row: np.ndarray, bpp: int
) -> np.ndarray:
    """Vectorized decode of a RUN of Average/Paeth scanlines.

    Both filters recur on (left, up, up-left) neighbours only, so cells
    on one anti-diagonal y + x = d depend solely on diagonals d-1/d-2:
    a block of consecutive filter-3/4 rows decodes in h + w - 1
    vectorized diagonal steps instead of h*w per-pixel Python steps
    (~25x on a 1024x1024 Average-filtered scan; pinned by
    tests/test_png.py). Color lanes are independent images with the
    same wavefront, so they ride along as a trailing axis.
    """
    bh, stride = lines.shape
    w = stride // bpp
    if bh < 4:  # wavefront overhead beats the win on short runs
        rows = _slow_rows_python(lines, fs, list(map(int, prev_row)), bpp)
        return np.array(rows, dtype=np.uint8)
    # Skewed layout: cell (y, x) lives at SK[y + 1, x + y + 2], the
    # prior row P at SK[0, x + 1]. Diagonal x + y = d is then the plain
    # column slice SK[:, d + 2] and every neighbour is a column slice
    # of d+1 — no fancy indexing — while the zero padding IS the
    # boundary rule (left/up-left of x < bpp slots read never-written
    # zeros, exactly the spec's out-of-frame zeros).
    L = lines.reshape(bh, w, bpp).astype(np.int16)
    skw = bh + w + 2
    # diagonal-major: SK[c] is one whole (contiguous) diagonal
    SK = np.zeros((skw, bh + 1, bpp), dtype=np.int16)
    LSK = np.zeros((skw, bh, bpp), dtype=np.int16)
    SK[1 : w + 1, 0] = prev_row.reshape(w, bpp)
    for y in range(bh):
        LSK[y + 2 : y + 2 + w, y] = L[y]
    all_avg = bool((fs == 3).all())
    all_paeth = bool((fs == 4).all())
    is_avg_col = (fs == 3)[:, None]
    t = np.empty((min(bh, w) + 1, bpp), dtype=np.int16)  # scratch
    for d in range(bh + w - 1):
        y_lo = max(0, d - w + 1)
        y_hi = min(bh - 1, d)
        r0, r1 = y_lo + 1, y_hi + 2
        c = d + 2
        left = SK[c - 1, r0:r1]
        up = SK[c - 1, r0 - 1 : r1 - 1]
        lv = LSK[c, y_lo : y_hi + 1]
        if all_avg:
            s = t[: r1 - r0]
            np.add(left, up, out=s)
            s >>= 1
            s += lv
            s &= 0xFF
            SK[c, r0:r1] = s
            continue
        upleft = SK[c - 2, r0 - 1 : r1 - 1]
        p = left + up - upleft
        pa = np.abs(p - left)
        pb = np.abs(p - up)
        pc_ = np.abs(p - upleft)
        pred = np.where(
            (pa <= pb) & (pa <= pc_), left, np.where(pb <= pc_, up, upleft)
        )
        pred += lv
        pred &= 0xFF
        if all_paeth:
            SK[c, r0:r1] = pred
        else:
            avg = (lv + ((left + up) >> 1)) & 0xFF
            SK[c, r0:r1] = np.where(is_avg_col[y_lo : y_hi + 1], avg, pred)
    out = np.empty((bh, stride), dtype=np.uint8)
    for y in range(bh):
        out[y] = SK[y + 2 : y + 2 + w, y + 1].reshape(stride)
    return out


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
    # typed rejections naming the unsupported feature: a real-world
    # crawl payload in one of these subformats must fail HERE with a
    # diagnosable error, not somewhere inside scanline reconstruction
    # (cv2.imread accepts all of these silently, OCR/src/detect.py:122
    # — this codec states its envelope instead)
    if interlace != 0:
        raise ValueError(
            "unsupported PNG feature: Adam7 interlacing (interlace=1); "
            "this codec decodes non-interlaced images only"
        )
    if color_type == 3:
        raise ValueError(
            "unsupported PNG feature: palette-indexed color (color type 3); "
            "this codec decodes 8-bit grayscale (0) and RGB (2) only"
        )
    if color_type in (4, 6):
        raise ValueError(
            f"unsupported PNG feature: alpha channel (color type {color_type}); "
            "this codec decodes 8-bit grayscale (0) and RGB (2) only"
        )
    if bit_depth != 8:
        raise ValueError(
            f"unsupported PNG feature: bit depth {bit_depth}; "
            "this codec decodes 8-bit samples only"
        )
    if color_type not in (0, 2):
        raise ValueError(
            f"unsupported PNG feature: color type {color_type}; "
            "this codec decodes 8-bit grayscale (0) and RGB (2) only"
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
    filters = raw_arr[:, 0]
    lines = raw_arr[:, 1:]
    prev = np.zeros(stride, dtype=np.int64)
    y = 0
    while y < height:
        f = int(filters[y])
        if f in (3, 4):
            # Average/Paeth: left-sequential within a row, but a RUN of
            # such rows decodes as a vectorized anti-diagonal wavefront
            # (see _decode_avg_paeth_block)
            y2 = y + 1
            while y2 < height and int(filters[y2]) in (3, 4):
                y2 += 1
            block = _decode_avg_paeth_block(
                lines[y:y2], filters[y:y2], prev, bpp
            )
            out[y:y2] = block
            prev = block[-1].astype(np.int64)
            y = y2
            continue
        line = lines[y].astype(np.int64)
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
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur.astype(np.uint8)
        prev = cur
        y += 1
    return out if bpp == 1 else out.reshape(height, width, 3)
