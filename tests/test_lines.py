"""E2 arbitrary-angle line extraction + W5 merge: kernel parity with
the independent pixel-based oracle (bit-for-bit), and semantics pins."""

from __future__ import annotations

import numpy as np

from cadastral_map_ocr_system_spark import oracle
from cadastral_map_ocr_system_spark.operators import mediapath as mp
from cadastral_map_ocr_system_spark.synth import FILL, decode_payload, media_payload


def test_kernel_parity_with_oracle():
    """Pipeline (run-length moments) == oracle (pixel moments) on 120
    payloads, raw and merged."""
    for i in range(60):
        for ref in (f"media://doc-{i:012d}/3", f"media://big/doc-{i:012d}/3"):
            grid = decode_payload(media_payload(ref))
            raw = mp.extract_line_segments(grid)
            assert raw == oracle.line_segments(grid), ref
            assert mp.merge_line_segments(raw) == oracle.merged_line_segments(
                grid
            ), ref


def test_axis_aligned_semantics_unchanged():
    g = np.zeros((64, 64), dtype=np.uint8)
    g[10, 5:30] = FILL    # horizontal, len 25
    g[20:40, 50] = FILL   # vertical, len 20
    lines = mp.extract_line_segments(g)
    assert [(l["x1"], l["y1"], l["x2"], l["y2"], l["length"], l["angle"]) for l in lines] == [
        (5, 10, 29, 10, 25.0, 0.0),
        (50, 20, 50, 39, 20.0, 90.0),
    ]


def test_diagonal_line_detected_with_angle():
    g = np.zeros((64, 64), dtype=np.uint8)
    for t in range(16):  # 45-degree staircase
        g[10 + t, 10 + t : 12 + t] = FILL
    (ln,) = mp.extract_line_segments(g)
    assert 40.0 < ln["angle"] < 50.0
    assert ln["length"] >= 15


def test_thick_blob_is_not_a_line():
    g = np.zeros((64, 64), dtype=np.uint8)
    g[10:18, 10:40] = FILL  # 8 px thick
    assert mp.extract_line_segments(g) == []


def test_merge_collapses_close_parallels_keeps_longest():
    g = np.zeros((64, 64), dtype=np.uint8)
    g[10, 5:30] = FILL   # len 25
    g[13, 5:22] = FILL   # len 17, parallel, midpoint ~4.6 px away
    raw = mp.extract_line_segments(g)
    assert len(raw) == 2
    (m,) = mp.merge_line_segments(raw)
    assert m["n_merged"] == 2
    assert (m["x1"], m["x2"], m["length"]) == (5, 29, 25.0)


def test_merge_keeps_distant_or_crossing_lines_apart():
    g = np.zeros((64, 64), dtype=np.uint8)
    g[10, 5:30] = FILL    # horizontal
    g[30:50, 40] = FILL   # far-away vertical
    merged = mp.merge_line_segments(mp.extract_line_segments(g))
    assert len(merged) == 2
    assert all(m["n_merged"] == 1 for m in merged)


def test_fixture_angle_spectrum_has_many_bins():
    """The synthetic corpus produces >2 angle-histogram bins (the
    round-1 gap: only 0/90 were ever detected)."""
    bins = set()
    for i in range(80):
        grid = decode_payload(media_payload(f"media://doc-{i:012d}/1"))
        for ln in mp.merge_line_segments(mp.extract_line_segments(grid)):
            bins.add(int(ln["angle"] // 30))
    assert len(bins) > 2, bins
