"""E3 block tiling with overlap (OCR/src/detect.py:1260-1262,1344-1419):
tiled and untiled segmentation must produce IDENTICAL region lists for
payloads whose components respect the containment contract (max
component dimension <= TILE_SIZE - TILE_STRIDE), and the coverage-skip
must be counted."""

from __future__ import annotations

import numpy as np

from cadastral_map_ocr_system_spark.operators.mediapath import (
    TILE_SIZE,
    TILE_STRIDE,
    extract_regions,
    extract_regions_tiled,
    tile_origins,
)
from cadastral_map_ocr_system_spark.synth import FILL, decode_payload, media_payload


def test_tile_origins_cover_and_overlap():
    for n in (1, 64, 128, 129, 240, 320, 1000):
        starts = tile_origins(n)
        assert starts[0] == 0
        assert starts[-1] + TILE_SIZE >= n  # full coverage
        assert all(b - a == TILE_STRIDE for a, b in zip(starts, starts[1:]))


def test_tiled_equals_untiled_on_big_payloads():
    """Golden equality over 25 multi-region skew payloads (240x320:
    always tiled) — every region, bbox, token, and center identical."""
    for i in range(25):
        grid = decode_payload(media_payload(f"media://big/doc-{i:012d}/0"))
        assert grid.shape[0] > TILE_SIZE  # actually exercises tiling
        assert extract_regions_tiled(grid) == extract_regions(grid)


def test_tiled_equals_untiled_small_passthrough():
    grid = decode_payload(media_payload("media://doc-000000000001/0"))
    assert grid.shape[0] <= TILE_SIZE and grid.shape[1] <= TILE_SIZE
    assert extract_regions_tiled(grid) == extract_regions(grid)


def test_tiling_skip_counted():
    """A mostly-empty canvas with one far-corner region: empty tiles are
    skipped (lossless at min_coverage=0) and counted."""
    grid = np.zeros((512, 512), dtype=np.uint8)
    grid[500:508, 500:512] = FILL  # area 96 >= MIN_AREA, token-less
    stats: dict = {}
    regs = extract_regions_tiled(grid, stats=stats)
    assert [(r["ymin"], r["xmin"]) for r in regs] == [(500, 500)]
    assert stats["n_tiles"] == 49  # 7x7 grid: starts 0,64,..,384
    assert 0 < stats["n_tiles_skipped"] < stats["n_tiles"]
    assert regs == extract_regions(grid)


def test_lossy_coverage_threshold_skips_sparse_tiles():
    grid = np.zeros((512, 512), dtype=np.uint8)
    grid[10:18, 10:22] = FILL  # ~0.6% of a 128x128 tile
    stats: dict = {}
    regs = extract_regions_tiled(grid, min_coverage=0.10, stats=stats)
    assert regs == []  # reference's 10% heuristic is lossy by design
    assert stats["n_tiles_skipped"] == stats["n_tiles"]
