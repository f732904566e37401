"""P1-P3 normalization: resize cap, contrast/polarity normalization,
morph-open cleanup — kernel properties plus the degraded-fixture
recovery invariant (scratched + inverted payloads extract identically
to their clean form)."""

from __future__ import annotations

import numpy as np

from cadastral_map_ocr_system_spark.operators import mediapath as mp
from cadastral_map_ocr_system_spark.operators.normalize import (
    contrast_stretch,
    invert_if_negative,
    morph_open,
    resize_cap,
)
from cadastral_map_ocr_system_spark.synth import FILL


def _rect_grid() -> np.ndarray:
    g = np.zeros((48, 64), dtype=np.uint8)
    g[10:18, 10:30] = FILL
    g[11, 11:16] = np.frombuffer(b"Konal", dtype=np.uint8)
    return g


def test_morph_open_identity_on_solid_regions():
    g = _rect_grid()
    mask = g > 32
    assert (morph_open(mask) == mask).all()


def test_morph_open_strips_attached_scratch():
    g = _rect_grid()
    clean_regions = mp.extract_regions(g, open_mask=True)
    g[6:10, 12] = FILL   # 1-px scratch attached to the region top
    g[18:21, 25] = FILL  # and one below
    raw = mp.extract_regions(g, open_mask=False)
    assert raw != clean_regions  # scratch really corrupts the bbox
    assert mp.extract_regions(g, open_mask=True) == clean_regions


def test_invert_if_negative_is_exact_involution():
    g = _rect_grid()
    neg = (255 - g).astype(np.uint8)
    assert (invert_if_negative(neg) == g).all()
    assert (invert_if_negative(g) == g).all()  # clean payload untouched


def test_degraded_payload_extracts_like_clean():
    """End-to-end recovery: scratch + invert, then normalize inside the
    extraction chain -> identical regions to the clean payload."""
    g = _rect_grid()
    clean = mp.extract_regions(g, open_mask=True)
    noisy = g.copy()
    noisy[6:10, 12] = FILL
    noisy = (255 - noisy).astype(np.uint8)
    got = mp.extract_regions(invert_if_negative(noisy), open_mask=True)
    assert got == clean
    assert clean[0]["token"] == "Konal"


def test_contrast_stretch_properties():
    g = (_rect_grid() // 2 + 40).astype(np.uint8)  # compressed range
    s = contrast_stretch(g)
    assert int(s.min()) == 0 and int(s.max()) == 255
    # monotone: order of distinct values preserved
    a, b = np.uint8(60), np.uint8(140)
    assert contrast_stretch(np.array([[a, b]]))[0, 0] < contrast_stretch(
        np.array([[a, b]])
    )[0, 1]
    # identity on full-range payloads
    full = np.array([[0, 255], [10, 20]], dtype=np.uint8)
    assert (contrast_stretch(full) == full).all()


def test_resize_cap():
    g = np.zeros((400, 300), dtype=np.uint8)
    g[::4, ::4] = 200
    r = resize_cap(g, max_dim=100)
    assert max(r.shape) == 100
    assert r.shape == (100, 75)
    assert resize_cap(g, max_dim=400) is g  # under cap: untouched
    assert set(np.unique(r)) <= set(np.unique(g))  # NN: no new values
