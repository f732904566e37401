"""Pure-Python WAV (RIFF/WAVE) PCM codec — struct + numpy only.

Completes the multimodal column family for real (no codec library in
this container, same discipline as the PNG codec in functions/png.py):
8-bit unsigned and 16-bit signed little-endian PCM, mono or multi-
channel. The reference analogue is the media loading step at
OCR/src/detect.py:122-128 (cv2.imread for images) generalized to the
audio modality.

Encode exists for fixtures and round-trip tests; decode is the
production path (operators/multimodal.py). Corrupt payloads raise
ValueError (never struct.error) so a bad blob in a media batch surfaces
as a per-item codec error, not a worker crash.
"""

from __future__ import annotations

import struct

import numpy as np

RIFF_MAGIC = b"RIFF"
WAVE_MAGIC = b"WAVE"
PCM_FORMAT = 1


def is_wav(payload: bytes) -> bool:
    return (
        len(payload) >= 12
        and payload[:4] == RIFF_MAGIC
        and payload[8:12] == WAVE_MAGIC
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """PCM WAV bytes from an int array shaped (n_frames,) or
    (n_frames, n_channels); dtype uint8 -> 8-bit, int16 -> 16-bit."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype == np.uint8:
        bits, data = 8, samples.astype("<u1").tobytes()
    elif samples.dtype == np.int16:
        bits, data = 16, samples.astype("<i2").tobytes()
    else:
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    n_channels = samples.shape[1]
    block_align = n_channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH",
        PCM_FORMAT,
        n_channels,
        sample_rate,
        sample_rate * block_align,
        block_align,
        bits,
    )
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) % 2:  # RIFF chunks are word-aligned
        chunks += b"\x00"
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunks)) + WAVE_MAGIC + chunks


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples shaped (n_frames, n_channels), sample_rate).

    8-bit PCM decodes as uint8, 16-bit as int16. Raises ValueError on
    non-WAV payloads, truncated chunks, non-PCM format codes, and
    unsupported bit depths.
    """
    if not is_wav(payload):
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if pos + 8 + length > len(payload):
            raise ValueError(f"truncated WAV chunk {tag!r}")
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length % 2)  # word alignment
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("WAV fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif tag == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    format_code, n_channels, sample_rate, _, block_align, bits = fmt
    if format_code != PCM_FORMAT:
        raise ValueError(f"unsupported WAV format code {format_code} (PCM only)")
    if n_channels < 1 or block_align != n_channels * bits // 8:
        raise ValueError("inconsistent WAV channel layout")
    if bits == 8:
        arr = np.frombuffer(data, dtype="<u1")
    elif bits == 16:
        arr = np.frombuffer(data[: len(data) - len(data) % 2], dtype="<i2")
    else:
        raise ValueError(f"unsupported WAV bit depth {bits} (8/16 PCM only)")
    n_frames = len(arr) // n_channels
    return arr[: n_frames * n_channels].reshape(n_frames, n_channels), sample_rate
