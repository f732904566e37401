"""Map-symbol template set (reference J1 inputs).

The reference loads reference symbols from a template sheet and slices
per-category glyphs out of it (OCR/src/symbol_detector.py:35-84:
water / terrain / transport regions -> contour-cropped binary
templates). Here the equivalent is a deterministic in-code set of
binary glyph masks — the broadcast side of the media template-match
join (operators/templatematch.py). Fixture payloads stamp scaled
instances of these glyphs (synth.py), mirroring the reference's
datasets/symbols sheet.
"""

from __future__ import annotations

import numpy as np

BASE = 12  # base template edge, px


def _trim(mask: np.ndarray) -> np.ndarray:
    """Crop to the content bbox: every template has non-empty first/last
    row and column, so a stamped instance's component bbox equals the
    stamp extent and candidate scoring reproduces it exactly."""
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    return mask[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]


def _build() -> dict[str, np.ndarray]:
    i, j = np.mgrid[0:BASE, 0:BASE]
    c = (BASE - 1) / 2.0
    temple = np.abs(j - c) <= (i + 1) * (c / BASE)          # filled triangle
    well = np.abs(i - c) + np.abs(j - c) <= c               # filled diamond
    settlement = ((j >= 4) & (j <= 7)) | ((i >= 4) & (i <= 7))  # plus/cross
    return {
        "temple": _trim(temple),
        "well": _trim(well),
        "settlement": _trim(settlement),
    }


TEMPLATES: dict[str, np.ndarray] = _build()
MATCH_SCALES = (0.75, 1.0, 1.25)  # detect.py:1376 reduced scale range
MATCH_THRESHOLD = 0.85            # detect.py:1383


def nn_resize(mask: np.ndarray, h: int, w: int) -> np.ndarray:
    """Nearest-neighbour resize of a binary mask to (h, w) — the
    deterministic stand-in for cv2.resize on templates
    (detect.py:1377). Endpoint-preserving sampling (first/last source
    rows+cols always included), so resizing a content-trimmed template
    never produces empty borders and a stamped instance's bbox equals
    its stamp extent."""
    th, tw = mask.shape
    ii = np.rint(np.arange(h) * (th - 1) / max(h - 1, 1)).astype(int)
    jj = np.rint(np.arange(w) * (tw - 1) / max(w - 1, 1)).astype(int)
    return mask[np.ix_(ii, jj)]


def scaled_template(name: str, scale: float) -> np.ndarray:
    t = TEMPLATES[name]
    return nn_resize(
        t, max(int(round(t.shape[0] * scale)), 1), max(int(round(t.shape[1] * scale)), 1)
    )
