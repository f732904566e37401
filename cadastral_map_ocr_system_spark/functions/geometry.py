"""Geometry scalar functions as built-in column expressions.

Reference semantics: Euclidean distance (OCR/src/detect.py:601-603),
line length/angle (OCR/src/symbol_detector.py:253-254, 149-153),
circularity 4*pi*A/P^2 (symbol_detector.py:149-153), IoU
(detect.py:1438-1463). All stay JVM-side / codegen'd.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

# greedy-dedup spatial threshold (detect.py:398, 405-406;
# OCR/config/detection_params.json:117-118)
DEDUP_MAX_DIST = 30.0
DEDUP_SIM_THRESHOLD = 0.8
DEDUP_NUM_DELTA = 1.0


def distance(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Euclidean distance (detect.py:601-603)."""
    return F.sqrt(F.pow(x1 - x2, 2) + F.pow(y1 - y2, 2))


def line_angle_deg(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Line angle in degrees (symbol_detector.py:253-254)."""
    return F.degrees(F.atan2(y2 - y1, x2 - x1))


def circularity(area: Column, perimeter: Column) -> Column:
    """4*pi*A/P^2 (symbol_detector.py:149-153)."""
    return F.lit(4.0 * math.pi) * area / F.pow(perimeter, 2)


def aspect_ratio(w: Column, h: Column) -> Column:
    return w / F.greatest(h, F.lit(1))


def iou(
    ax: Column, ay: Column, aw: Column, ah: Column,
    bx: Column, by: Column, bw: Column, bh: Column,
) -> Column:
    """Intersection-over-union of two xywh boxes (detect.py:1438-1463)."""
    ix = F.greatest(
        F.least(ax + aw, bx + bw) - F.greatest(ax, bx), F.lit(0)
    )
    iy = F.greatest(
        F.least(ay + ah, by + bh) - F.greatest(ay, by), F.lit(0)
    )
    inter = ix * iy
    union = aw * ah + bw * bh - inter
    return inter / F.greatest(union, F.lit(1e-9))


# Python mirrors for the oracle / in-UDF use ---------------------------
def py_distance(x1: float, y1: float, x2: float, y2: float) -> float:
    return math.hypot(x1 - x2, y1 - y2)


def py_iou(a: tuple, b: tuple) -> float:
    ax, ay, aw, ah = a
    bx, by, bw, bh = b
    ix = max(min(ax + aw, bx + bw) - max(ax, bx), 0)
    iy = max(min(ay + ah, by + bh) - max(ay, by), 0)
    inter = ix * iy
    union = aw * ah + bw * bh - inter
    return inter / max(union, 1e-9)
