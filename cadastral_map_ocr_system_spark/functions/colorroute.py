"""Ink-color bands + routing primitives — numpy-only leaf module.

The reference classifies map content by ink color: red = survey
numbers, black = names/text, blue = water (OCR/src/detect.py:229-321).
These primitives run inside the mapInArrow extraction workers, so they
must not pull pandas/pyspark into every Python worker process —
operators/colormask.py layers the DataFrame stages (and the
morph-cleaned full-image masks) on top of them.
"""

from __future__ import annotations

import numpy as np

# RGB inclusive bands per color family (reference color_thresholds config)
COLOR_THRESHOLDS: dict[str, tuple[tuple[int, int, int], tuple[int, int, int]]] = {
    "red": ((100, 0, 0), (255, 90, 90)),
    "black": ((0, 0, 0), (80, 80, 80)),
    "blue": ((0, 0, 100), (90, 90, 255)),
}

# color family -> field category (detect.py:229-321 routing)
COLOR_ROUTING = {"red": "number", "black": "name", "blue": "water"}


def band_mask(img: np.ndarray, color: str) -> np.ndarray:
    """Raw boolean mask of pixels inside the color's RGB band (no
    morphological cleanup). img: (h, w, 3)."""
    lo, hi = COLOR_THRESHOLDS[color]
    mask = np.ones(img.shape[:2], dtype=bool)
    for c in range(3):
        mask &= (img[:, :, c] >= lo[c]) & (img[:, :, c] <= hi[c])
    return mask


def dominant_color(img: np.ndarray, bbox: tuple[int, int, int, int]) -> str | None:
    """Color family with the most band pixels inside bbox (x, y, w, h);
    None when no family covers any pixel. Ties break alphabetically
    (deterministic)."""
    x, y, w, h = bbox
    crop = img[y : y + h, x : x + w]
    best, best_n = None, 0
    for color in sorted(COLOR_THRESHOLDS):
        n = int(band_mask(crop, color).sum())
        if n > best_n:
            best, best_n = color, n
    return best


def route_category(img: np.ndarray, bbox: tuple[int, int, int, int]) -> str | None:
    """bbox -> field category via its dominant ink color."""
    c = dominant_color(img, bbox)
    return COLOR_ROUTING[c] if c else None
