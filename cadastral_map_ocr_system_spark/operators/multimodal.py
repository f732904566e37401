"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side contract (schema, partitioning, Arrow batch shape,
1->N emission) is real and tested; the actual codec calls are stubbed
behind `_decode_image` / `_decode_audio` because the media libraries
(Pillow/OpenCV/ffmpeg) are not in this container — a deployment swaps
the stub body, nothing else.

Pattern: mapInPandas/mapInArrow over batches of (ref, payload binary,
media_type), emitting per-item feature rows. Mirrors the reference's
image load + feature extraction (OCR/src/detect.py:122-128,
train_data_extractor.py:64-150) generalized to any modality.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

MEDIA_META_SCHEMA = (
    "ref string, media_type string, n_bytes long, sha256 string, "
    "width int, height int, n_channels int, n_frames int"
)

FRAME_FEATURES_SCHEMA = (
    "ref string, frame_idx int, mean_intensity double, std_intensity double"
)


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB: real deployments decode via PIL/cv2. Here: a deterministic
    fake decode — payload bytes reshaped into a square-ish uint8 grid —
    so the surrounding plumbing is executable and testable."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(len(arr) ** 0.5), 1)
    return arr[: side * side].reshape(side, side)


def _decode_audio(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "audio decode requires an audio codec library not present in "
        "this container; swap this stub in deployment"
    )


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Per-item typed metadata from opaque binary payloads (mapInPandas)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, media_type, payload in zip(
                pdf["ref"], pdf["media_type"], pdf[payload_col]
            ):
                b = bytes(payload)
                row = {
                    "ref": ref,
                    "media_type": media_type,
                    "n_bytes": len(b),
                    "sha256": hashlib.sha256(b).hexdigest(),
                    "width": None,
                    "height": None,
                    "n_channels": None,
                    "n_frames": None,
                }
                if media_type == "image":
                    img = _decode_image(b)
                    row.update(
                        width=int(img.shape[1]), height=int(img.shape[0]),
                        n_channels=1, n_frames=1,
                    )
                rows.append(row)
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=MEDIA_META_SCHEMA)


def frame_sample_features(
    df: DataFrame, every_n_rows: int = 16, payload_col: str = "payload"
) -> DataFrame:
    """1->N emission: sample 'frames' (row-bands of the decoded grid)
    and emit per-frame intensity features — the video-frame-sampling
    shape with the codec stubbed."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for ref, payload in zip(pdf["ref"], pdf[payload_col]):
                img = _decode_image(bytes(payload))
                for frame_idx, y in enumerate(range(0, img.shape[0], every_n_rows)):
                    band = img[y : y + every_n_rows].astype(np.float64)
                    rows.append(
                        {
                            "ref": ref,
                            "frame_idx": frame_idx,
                            "mean_intensity": float(band.mean()),
                            "std_intensity": float(band.std()),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.mapInPandas(gen, schema=FRAME_FEATURES_SCHEMA)
