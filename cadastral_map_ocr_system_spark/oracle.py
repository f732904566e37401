"""Single-process reference oracle (SURVEY.md §5 step 1).

An independent plain-Python implementation of the extraction
semantics: simple BFS flood-fill component labeling (vs the pipeline's
run-length union-find), straight loops for dedup and re-zip. It shares
with the pipeline only the *fixture generator* (synth payloads) and
the *rule constants / scalar rule mirrors* in functions.text — the
dataflow itself is written twice, so the invariant test exercises the
Spark orchestration and the vectorized kernels, not one shared code
path.

Golden invariant (BASELINE.json): for every doc_id the pipeline's span
sequence (kind, text, media_ref, order) exactly equals this oracle's.
"""

from __future__ import annotations

from collections import deque

from .functions.geometry import DEDUP_MAX_DIST, DEDUP_NUM_DELTA, DEDUP_SIM_THRESHOLD
from .functions.similarity import jaccard_charset
from .functions.text import (
    MIN_CONF,
    py_clean_token,
    py_is_valid_name,
    py_is_valid_number,
    py_strip_boilerplate,
)
from .functions.colorroute import COLOR_ROUTING, COLOR_THRESHOLDS
from .operators.mediapath import token_conf
from .operators.normalize import (
    GRADIENT_FG_FRAC,
    LOCAL_EQ_MIN_RANGE,
    LOCAL_EQ_PCT,
    LOCAL_EQ_TILE,
)
from .synth import (
    BIN_THRESHOLD,
    FILL,
    LOWC_TOKEN_BASE,
    LOWC_TOKEN_SHIFT,
    MIN_AREA,
    decode_payload_any,
    media_payload,
)

MAX_UNTILED_MIRROR = 512       # mediapath.MAX_UNTILED
DESKEW_MIN_ANGLE_MIRROR = 0.5  # mediapath.DESKEW_MIN_ANGLE
RESIZE_CAP_MIRROR = 1024       # normalize.RESIZE_CAP


def _decimate_cap(arr, cap: int = RESIZE_CAP_MIRROR):
    """Mirror of normalize.resize_cap (P1): endpoint-preserving NN
    decimation via per-index Python round (half-even, as np.rint)."""
    h, w = arr.shape[0], arr.shape[1]
    if max(h, w) <= cap:
        return arr
    scale = cap / max(h, w)
    nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
    rows = [round(i * (h - 1) / max(nh - 1, 1)) for i in range(nh)]
    cols = [round(j * (w - 1) / max(nw - 1, 1)) for j in range(nw)]
    return arr[rows][:, cols]


def _invert_if_negative(grid):
    """Mirror of normalize.invert_if_negative (independent count loop)."""
    bright = sum(1 for row in grid for v in row if v > 127)
    if bright * 2 > grid.shape[0] * grid.shape[1]:
        return 255 - grid
    return grid


def _open_mask(grid) -> set[tuple[int, int]]:
    """Independent 3x3 binary opening over grid > threshold, as pixel
    sets (mirror of normalize.morph_open; outside = background)."""
    h, w = grid.shape
    fg = {
        (y, x) for y in range(h) for x in range(w) if grid[y][x] > BIN_THRESHOLD
    }
    eroded = {
        (y, x)
        for (y, x) in fg
        if all(
            (y + dy, x + dx) in fg for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        )
    }
    return {
        (y + dy, x + dx)
        for (y, x) in eroded
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if 0 <= y + dy < h and 0 <= x + dx < w
    }


def _flood_components(grid, mask: set | None = None) -> list[list[tuple[int, int]]]:
    """BFS 4-connected components over grid > threshold (no filters);
    an explicit pixel-set mask overrides the binarization."""
    h, w = grid.shape
    if mask is None:
        mask = {
            (y, x) for y in range(h) for x in range(w) if grid[y][x] > BIN_THRESHOLD
        }
    seen = [[False] * w for _ in range(h)]
    comps = []
    for y0 in range(h):
        for x0 in range(w):
            if (y0, x0) not in mask or seen[y0][x0]:
                continue
            q = deque([(y0, x0)])
            seen[y0][x0] = True
            pixels = []
            while q:
                y, x = q.popleft()
                pixels.append((y, x))
                for ny, nx in ((y - 1, x), (y + 1, x), (y, x - 1), (y, x + 1)):
                    if 0 <= ny < h and 0 <= nx < w and not seen[ny][nx] and (ny, nx) in mask:
                        seen[ny][nx] = True
                        q.append((ny, nx))
            comps.append(pixels)
    return comps


def _regions_from_pixels(comps: list[list[tuple[int, int]]], tok) -> list[dict]:
    """Min-area filter + token decode over flood-filled components;
    token bytes read from the (possibly separate) token grid."""
    regions = []
    for pixels in comps:
        if len(pixels) < MIN_AREA:
            continue
        ys = [p[0] for p in pixels]
        xs = [p[1] for p in pixels]
        ymin, ymax, xmin, xmax = min(ys), max(ys), min(xs), max(xs)
        token_chars = [
            chr(tok[y][x])
            for (y, x) in sorted(pixels)
            if tok[y][x] != FILL and 33 <= tok[y][x] <= 126
        ]
        # bbox width convention matches the run-based labeler:
        # runs are [x_start, x_end_exclusive), so w = xmax+1-xmin
        rw = xmax + 1 - xmin
        rh = ymax - ymin + 1
        regions.append(
            {
                "ymin": ymin,
                "xmin": xmin,
                "w": rw,
                "h": rh,
                "cx": xmin + rw / 2.0,
                "cy": ymin + rh / 2.0,
                "token": "".join(token_chars),
            }
        )
    regions.sort(key=lambda r: (r["ymin"], r["xmin"]))
    return regions


def _flood_regions(grid, tok=None) -> list[dict]:
    """Token regions: morph-opened mask -> min-area filtered components
    + decoded tokens (P3 cleanup mirrored)."""
    return _regions_from_pixels(
        _flood_components(grid, mask=_open_mask(grid)),
        grid if tok is None else tok,
    )


def _local_enhance(grid):
    """Independent mirror of normalize.local_contrast_enhance: per-tile
    rank stretch, sorted-list percentile anchor, flat-tile gate."""
    import numpy as _np

    h, w = grid.shape

    out = _np.zeros((h, w), dtype=_np.int64)
    t = LOCAL_EQ_TILE
    for ty in range(0, h, t):
        for tx in range(0, w, t):
            vals = sorted(
                int(grid[y][x])
                for y in range(ty, min(ty + t, h))
                for x in range(tx, min(tx + t, w))
            )
            lo = float(vals[int(LOCAL_EQ_PCT * len(vals))])
            hi = float(vals[-1])
            if hi - lo < LOCAL_EQ_MIN_RANGE:
                continue
            scale = 255.0 / (hi - lo)
            for y in range(ty, min(ty + t, h)):
                for x in range(tx, min(tx + t, w)):
                    v = round((float(grid[y][x]) - lo) * scale)
                    out[y][x] = min(max(v, 0), 255)
    return out


def _comp_angle(pixels) -> float | None:
    """Mirror of mediapath._component_angle from raw pixel lists:
    principal-axis angle with min-area and elongation gates."""
    import math

    n = len(pixels)
    if n < MIN_AREA:
        return None
    sx = sum(x for _, x in pixels)
    sy = sum(y for y, _ in pixels)
    sxx = sum(x * x for _, x in pixels)
    syy = sum(y * y for y, _ in pixels)
    sxy = sum(y * x for y, x in pixels)
    mx, my = sx / n, sy / n
    cxx = sxx / n - mx * mx
    cyy = syy / n - my * my
    cxy = sxy / n - mx * my
    tr = cxx + cyy
    det = math.sqrt(max((cxx - cyy) ** 2 + 4 * cxy * cxy, 0.0))
    l1, l2 = (tr + det) / 2.0, (tr - det) / 2.0
    if l2 <= 1e-9 or l1 / max(l2, 1e-9) < 2.25:  # elongation 1.5^2
        return None
    angle = 0.5 * math.degrees(math.atan2(2 * cxy, cxx - cyy))
    while angle >= 45:
        angle -= 90
    while angle < -45:
        angle += 90
    return angle


def _median_comp_angle(comps) -> float:
    angles = [a for a in (_comp_angle(p) for p in comps) if a is not None]
    if not angles:
        return 0.0
    angles.sort()
    m = len(angles)
    return angles[m // 2] if m % 2 else (angles[m // 2 - 1] + angles[m // 2]) / 2.0


def _rotate(grid, angle_deg: float):
    """Mirror of mediapath.rotate_grid (per-pixel inverse NN map)."""
    import math

    import numpy as _np

    h, w = grid.shape
    rad = math.radians(angle_deg)
    cos, sin = math.cos(rad), math.sin(rad)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    out = _np.zeros_like(grid)
    for y in range(h):
        for x in range(w):
            xi = round(cos * (x - cx) + sin * (y - cy) + cx)
            yi = round(-sin * (x - cx) + cos * (y - cy) + cy)
            if 0 <= xi < w and 0 <= yi < h:
                out[y][x] = grid[yi][xi]
    return out


def _dominant_color(img, x: int, y: int, w: int, h: int) -> str | None:
    """Mirror of colormask.dominant_color: count pixels of each color
    band in the bbox crop; most wins, ties alphabetical."""
    best, best_n = None, 0
    for color in sorted(COLOR_THRESHOLDS):
        lo, hi = COLOR_THRESHOLDS[color]
        n = 0
        for yy in range(y, min(y + h, img.shape[0])):
            for xx in range(x, min(x + w, img.shape[1])):
                p = img[yy][xx]
                if all(lo[c] <= p[c] <= hi[c] for c in range(3)):
                    n += 1
        if n > best_n:
            best, best_n = color, n
    return best


def _dominant_category(img, x: int, y: int, w: int, h: int) -> str | None:
    """Mirror of colormask.route_category (color -> field family)."""
    color = _dominant_color(img, x, y, w, h)
    return COLOR_ROUTING[color] if color else None


def line_segments(grid) -> list[dict]:
    """Independent mirror of mediapath.extract_line_segments: principal
    axis from per-pixel integer moments (the pipeline uses run-length
    closed forms — sums are identical integers, so the derived floats
    agree bit-for-bit), thin/long gates, extreme-pixel endpoints,
    angle in [0, 180)."""
    import math

    grid = _invert_if_negative(grid)
    lines = []
    for pixels in _flood_components(grid):
        n = len(pixels)
        sx = sum(x for _, x in pixels)
        sy = sum(y for y, _ in pixels)
        sxx = sum(x * x for _, x in pixels)
        syy = sum(y * y for y, _ in pixels)
        sxy = sum(y * x for y, x in pixels)
        mx, my = sx / n, sy / n
        cxx = sxx / n - mx * mx
        cyy = syy / n - my * my
        cxy = sxy / n - mx * my
        theta = 0.5 * math.atan2(2 * cxy, cxx - cyy)
        ct, st = math.cos(theta), math.sin(theta)
        umin = vmin = float("inf")
        umax = vmax = float("-inf")
        pmin = pmax = None
        for y, x in sorted(pixels):
            u = (x - mx) * ct + (y - my) * st
            v = -(x - mx) * st + (y - my) * ct
            vmin, vmax = min(vmin, v), max(vmax, v)
            if u < umin:
                umin, pmin = u, (y, x)
            if u > umax:
                umax, pmax = u, (y, x)
        if (vmax - vmin + 1) > 2.5:
            continue
        length = umax - umin + 1
        if length < 15:
            continue
        p1, p2 = sorted([pmin, pmax])
        angle = math.degrees(math.atan2(p2[0] - p1[0], p2[1] - p1[1])) % 180.0
        lines.append(
            {"x1": p1[1], "y1": p1[0], "x2": p2[1], "y2": p2[0],
             "length": float(length), "angle": angle}
        )
    lines.sort(key=lambda r: (r["y1"], r["x1"]))
    return lines


def merged_line_segments(grid) -> list[dict]:
    """Mirror of mediapath.merge_line_segments over this oracle's
    segments: greedy grouping vs each group's first member (angle
    within 5 deg circular, midpoints within 10 px), longest member
    wins (first-come on ties)."""
    groups: list[list[dict]] = []
    for ln in line_segments(grid):
        mid = ((ln["x1"] + ln["x2"]) / 2.0, (ln["y1"] + ln["y2"]) / 2.0)
        placed = False
        for g in groups:
            f = g[0]
            da = abs(ln["angle"] - f["angle"])
            da = min(da, 180.0 - da)
            fmid = ((f["x1"] + f["x2"]) / 2.0, (f["y1"] + f["y2"]) / 2.0)
            if (
                da < 5.0
                and ((mid[0] - fmid[0]) ** 2 + (mid[1] - fmid[1]) ** 2) ** 0.5 < 10.0
            ):
                g.append(ln)
                placed = True
                break
        if not placed:
            groups.append([ln])
    out = []
    for g in groups:
        best = g[0]
        for ln in g[1:]:
            if ln["length"] > best["length"]:
                best = ln
        out.append({**best, "n_merged": len(g)})
    out.sort(key=lambda r: (r["y1"], r["x1"]))
    return out


def template_matches(grid) -> list[dict]:
    """Independent mirror of templatematch.match_components: flood-fill
    candidates, set-of-pixels masks, plain-loop NN template resize."""
    from .templates import MATCH_THRESHOLD, TEMPLATES

    grid = _invert_if_negative(grid)
    out = []
    for pixels in _flood_components(grid):
        ys = [p[0] for p in pixels]
        xs = [p[1] for p in pixels]
        ymin, xmin = min(ys), min(xs)
        h = max(ys) - ymin + 1
        w = max(xs) - xmin + 1
        if len(pixels) < 30 or not (6 <= h <= 20 and 6 <= w <= 20):
            continue
        pset = {(y - ymin, x - xmin) for y, x in pixels}
        for name in sorted(TEMPLATES):
            t = TEMPLATES[name]
            th, tw = t.shape
            agree = 0
            for i in range(h):
                si = round(i * (th - 1) / max(h - 1, 1))
                for j in range(w):
                    sj = round(j * (tw - 1) / max(w - 1, 1))
                    agree += bool(t[si, sj]) == ((i, j) in pset)
            score = agree / (h * w)
            if score >= MATCH_THRESHOLD:
                out.append(
                    {"template": name, "x": xmin, "y": ymin, "w": w, "h": h,
                     "scale": round(h / th, 4), "score": round(score, 6)}
                )
    out.sort(key=lambda r: (r["y"], r["x"], r["template"]))
    return out


# _media_records is a pure function of ref (the ref embeds doc_id and
# offset, and payload bytes are a pure function of ref), so results are
# memoized — the driver's correctness pass and the invariant tests
# evaluate the same corpus several times. Callers get fresh row dicts.
_MEDIA_CACHE: dict[str, list[dict]] = {}


def _media_records(doc_id: str, offset: int, ref: str) -> list[dict]:
    cached = _MEDIA_CACHE.get(ref)
    if cached is None:
        cached = _MEDIA_CACHE[ref] = _media_records_uncached(offset, ref)
    return [dict(r) for r in cached]


def _media_records_uncached(offset: int, ref: str) -> list[dict]:
    import numpy as _np

    gray, img = decode_payload_any(media_payload(ref))
    gray = _decimate_cap(gray)
    if img is not None:
        img = _decimate_cap(img)
    grid = _invert_if_negative(gray.astype(int))
    # gradient gate mirror (mediapath.normalize_payload)
    n_fg = sum(1 for row in grid for v in row if v > BIN_THRESHOLD)
    if n_fg / grid.size > GRADIENT_FG_FRAC:
        seg = _local_enhance(grid)
        tok = _np.where(grid >= LOWC_TOKEN_BASE, grid - LOWC_TOKEN_SHIFT, FILL)
    else:
        seg, tok = grid, grid
    # deskew mirror (single-channel untiled payloads)
    if img is None and max(grid.shape) <= MAX_UNTILED_MIRROR:
        comps = _flood_components(seg, mask=_open_mask(seg))
        angle = _median_comp_angle(comps)
        if abs(angle) > DESKEW_MIN_ANGLE_MIRROR:
            same = tok is seg
            seg = _rotate(seg, -angle)
            tok = seg if same else _rotate(tok, -angle)
            comps = _flood_components(seg, mask=_open_mask(seg))
        regions = _regions_from_pixels(comps, tok)
    else:
        regions = _flood_regions(seg, tok)
    out = []
    for region_idx, reg in enumerate(regions):
        token = reg["token"]
        if len(token) < 1:
            continue
        conf = token_conf(ref, token)
        if conf < MIN_CONF:
            continue
        clean = py_clean_token(token)
        category = (
            _dominant_category(img, reg["xmin"], reg["ymin"], reg["w"], reg["h"])
            if img is not None
            else None
        )
        # classification driver mirror (mediapath.classify_token)
        if category == "number":
            if not py_is_valid_number(clean):
                continue
            is_number = True
        elif category in ("name", "water"):
            if not py_is_valid_name(clean):
                continue
            is_number = False
        elif py_is_valid_number(clean):
            is_number = True
        elif py_is_valid_name(clean):
            is_number = False
        else:
            continue
        out.append(
            {
                "offset": offset,
                "region_idx": region_idx,
                "token_idx": 0,
                "kind": "media",
                "text": clean,
                "media_ref": ref,
                "conf": conf,
                "cx": reg["cx"],
                "cy": reg["cy"],
                "is_number": is_number,
            }
        )
    return out


def _dedup(rows: list[dict]) -> list[dict]:
    rows = sorted(
        rows,
        key=lambda r: (-r["conf"], r["offset"], r["region_idx"], r["token_idx"]),
    )
    kept: list[dict] = []
    for r in rows:
        dup = False
        for k in kept:
            if k["offset"] != r["offset"] or k["is_number"] != r["is_number"]:
                continue
            dx, dy = r["cx"] - k["cx"], r["cy"] - k["cy"]
            if dx * dx + dy * dy >= DEDUP_MAX_DIST * DEDUP_MAX_DIST:
                continue
            if r["is_number"]:
                if abs(int(r["text"]) - int(k["text"])) <= DEDUP_NUM_DELTA:
                    dup = True
                    break
            else:
                if jaccard_charset(r["text"], k["text"]) > DEDUP_SIM_THRESHOLD:
                    dup = True
                    break
        if not dup:
            kept.append(r)
    return kept


def extract_doc(doc: dict) -> list[tuple]:
    """One document -> golden span sequence [(kind, text, media_ref, order)]."""
    text_rows: list[dict] = []
    media_rows: list[dict] = []
    for span in doc["spans"]:
        if span["kind"] == "text":
            cleaned = py_strip_boilerplate(span["text"])
            if len(cleaned) > 0:
                text_rows.append(
                    {
                        "offset": span["offset"],
                        "region_idx": 0,
                        "token_idx": 0,
                        "kind": "text",
                        "text": cleaned,
                        "media_ref": None,
                    }
                )
        else:
            media_rows.extend(
                _media_records(doc["doc_id"], span["offset"], span["media_ref"])
            )
    rows = text_rows + _dedup(media_rows)
    rows.sort(key=lambda r: (r["offset"], r["region_idx"], r["token_idx"]))
    return [
        (r["kind"], r["text"], r["media_ref"], order)
        for order, r in enumerate(rows)
    ]


def extract_corpus(docs: list[dict]) -> dict[str, list[tuple]]:
    """Golden output for every document (including empty ones)."""
    return {doc["doc_id"]: extract_doc(doc) for doc in docs}


def greedy_match(
    det_rows: list[dict], gt_rows: list[dict], thresholds: dict[str, float]
) -> list[dict]:
    """Independent mirror of operators.evaluation.greedy_iou_match
    (reference J2, OCR/src/validate_detection.py:54-137): plain dict
    grouping + nested loops instead of the pipeline's cogrouped pandas
    map. Shares only the scalar py_iou leaf (functions.geometry) with
    the pipeline, per the oracle discipline in the module header.

    Semantics mirrored: per (doc_id, offset, category), detections in
    (-conf, idx) order each claim the still-unmatched GT box with the
    highest IoU strictly above the category threshold (GT scanned in
    ascending idx, strict > keeps the lowest idx on ties); matched ->
    tp, unmatched detection -> fp, leftover GT -> fn.
    """
    from .functions.geometry import py_iou as _iou

    FALLBACK = 0.25
    groups: dict[tuple, dict[str, list]] = {}
    for r in det_rows:
        g = groups.setdefault((r["doc_id"], r["offset"], r["category"]), {"d": [], "g": []})
        g["d"].append(r)
    for r in gt_rows:
        g = groups.setdefault((r["doc_id"], r["offset"], r["category"]), {"d": [], "g": []})
        g["g"].append(r)
    out: list[dict] = []
    for (doc_id, offset, cat), g in groups.items():
        t = thresholds.get(cat, FALLBACK)
        gt_boxes = {int(r["idx"]): (r["x"], r["y"], r["w"], r["h"]) for r in g["g"]}
        unmatched = set(gt_boxes)
        for d in sorted(g["d"], key=lambda r: (-r["conf"], r["idx"])):
            best, best_iou = None, t
            for gi in sorted(unmatched):
                iou = _iou((d["x"], d["y"], d["w"], d["h"]), gt_boxes[gi])
                if iou > best_iou:
                    best, best_iou = gi, iou
            base = {"doc_id": doc_id, "offset": offset, "category": cat}
            if best is not None:
                unmatched.discard(best)
                out.append({**base, "outcome": "tp", "det_idx": int(d["idx"]),
                            "gt_idx": best, "iou": round(best_iou, 6)})
            else:
                out.append({**base, "outcome": "fp", "det_idx": int(d["idx"]),
                            "gt_idx": None, "iou": None})
        for gi in sorted(unmatched):
            out.append({"doc_id": doc_id, "offset": offset, "category": cat,
                        "outcome": "fn", "det_idx": None, "gt_idx": gi,
                        "iou": None})
    return out


def audio_feature_rows(refs: list[str]) -> list[dict]:
    """Independent mirror of operators.multimodal.audio_features: plain
    Python loops + math.fsum instead of vectorized numpy. Shares only
    the WAV codec leaf (functions.wav) and the fixture generator
    (synth.wav_payload).

    No rounding on either side: every sum here is over integer-valued
    floats (PCM samples, centered), exact below 2^53 in ANY summation
    order, so fsum, pairwise numpy, and sequential sums all yield the
    SAME double — sqrt/division are IEEE-determined from there."""
    import math

    from .functions.wav import decode_wav
    from .synth import wav_payload

    out = []
    for ref in refs:
        samples, rate = decode_wav(wav_payload(ref))
        offset = 128.0 if samples.dtype.kind == "u" else 0.0
        vals = [float(v) - offset for row in samples.tolist() for v in row]
        ch0 = [float(row[0]) - offset for row in samples.tolist()]
        crossings = sum(
            1 for a, b in zip(ch0, ch0[1:]) if (a < 0) != (b < 0)
        )
        n = len(vals)
        out.append(
            {
                "ref": ref,
                "n_frames": int(samples.shape[0]),
                "sample_rate": int(rate),
                "rms": math.sqrt(math.fsum(v * v for v in vals) / n),
                "mean_amplitude": math.fsum(abs(v) for v in vals) / n,
                "zero_crossing_rate": crossings / max(len(ch0) - 1, 1),
            }
        )
    return out


def _classify_accepts(clean: str, category: str | None) -> bool:
    """Mirror of mediapath.classify_token's accept/reject verdict."""
    if category == "number":
        return py_is_valid_number(clean)
    if category in ("name", "water"):
        return py_is_valid_name(clean)
    return py_is_valid_number(clean) or py_is_valid_name(clean)


def color_route_rows(doc_id: str, offset: int, ref: str) -> list[dict]:
    """Independent mirror of colormask.color_route_features for one
    media span: BFS flood regions over the raw derived-gray grid (no
    inversion — white-paper RGB grays are background-0 already, as the
    pipeline's path assumes), per-pixel color-band counting for the
    dominant ink, routing via COLOR_ROUTING, acceptance via the
    classification-rule mirror. Non-RGB payloads yield no rows."""
    gray, img = decode_payload_any(media_payload(ref))
    if img is None:
        return []
    grid = gray.astype(int)
    comps = _flood_components(grid, mask=_open_mask(grid))
    out = []
    for i, reg in enumerate(_regions_from_pixels(comps, grid)):
        if not reg["token"]:
            continue
        color = _dominant_color(img, reg["xmin"], reg["ymin"], reg["w"], reg["h"])
        category = COLOR_ROUTING[color] if color else None
        clean = py_clean_token(reg["token"])
        out.append(
            {
                "doc_id": doc_id, "offset": offset, "region_idx": i,
                "color": color, "category": category, "token": clean,
                "accepted": _classify_accepts(clean, category),
            }
        )
    return out


def _dilate_set(fg: set, h: int, w: int) -> set:
    return {
        (y + dy, x + dx)
        for (y, x) in fg
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if 0 <= y + dy < h and 0 <= x + dx < w
    }


def _erode_set(fg: set) -> set:
    return {
        (y, x)
        for (y, x) in fg
        if all((y + dy, x + dx) in fg for dy in (-1, 0, 1) for dx in (-1, 0, 1))
    }


def color_coverage_rows(ref: str) -> list[dict]:
    """Independent mirror of colormask.color_coverage_features for one
    RGB payload: per-pixel band membership, then set-based 3x3 open +
    close (outside-of-frame = background, matching the pipeline's
    zero-padded shifts)."""
    _, img = decode_payload_any(media_payload(ref))
    h, w = img.shape[0], img.shape[1]
    out = []
    for color in sorted(COLOR_THRESHOLDS):
        lo, hi = COLOR_THRESHOLDS[color]
        band = {
            (y, x)
            for y in range(h)
            for x in range(w)
            if all(lo[c] <= img[y][x][c] <= hi[c] for c in range(3))
        }
        opened = _dilate_set(_erode_set(band), h, w)
        closed = _erode_set(_dilate_set(opened, h, w))
        out.append(
            {
                "ref": ref, "color": color,
                "coverage": len(closed) / (h * w),
                "n_pixels": len(closed),
            }
        )
    return out


def nms_rows(box_rows: list[dict], threshold: float) -> list[dict]:
    """Independent mirror of operators.nms.nms_boxes: per (doc_id,
    offset) group, greedy confidence-descending suppression with the
    same (conf desc, box asc) total order; shares only the py_iou leaf."""
    from .functions.geometry import py_iou as _iou

    groups: dict[tuple, list[dict]] = {}
    for r in box_rows:
        groups.setdefault((r["doc_id"], r["offset"]), []).append(r)
    out = []
    for rows in groups.values():
        ordered = sorted(
            rows, key=lambda r: (-r["conf"], (r["x"], r["y"], r["w"], r["h"]))
        )
        kept: list[dict] = []
        for r in ordered:
            if all(
                _iou((r["x"], r["y"], r["w"], r["h"]),
                     (k["x"], k["y"], k["w"], k["h"])) <= threshold
                for k in kept
            ):
                kept.append(r)
        out.extend(kept)
    return out
