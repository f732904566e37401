"""Deterministic synthetic corpus of interleaved text+media documents.

A ``(seed, doc_id)`` pair fully determines a document, including the
bytes of every media payload (FIXTURES.md §1) — so the Spark pipeline
and the single-process oracle see identical inputs with no external
data, and generation itself can run distributed (one task generates
its own id-range; no driver-side materialization).

Media payloads are small 2-D uint8 "scanned map" grids in the spirit
of the reference's inputs (OCR/datasets: ~5300x4950 px scans):
background 0, rectangular token regions filled with 200 whose second
row carries the token's ASCII bytes, plus sub-min-area noise blobs and
single-pixel speckles (min-area semantics per
OCR/src/symbol_detector.py:148,207). Tokens are drawn from the
reference golden vocabulary (OCR/results/cadastral_output.csv): place
names, survey numbers 1..9999 (some intentionally out of range), and
OCR-noise lookalikes the noise regexes must reject
(OCR/src/detect.py:489-500).
"""

from __future__ import annotations

import random
import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

MAGIC = b"CM01"
# bump when generator output changes, so cached fixture corpora
# (e.g. the bench corpus under /tmp) are regenerated rather than reused
FIXTURE_VERSION = 5
FILL = 200          # region fill intensity
# Binarization threshold. Must sit BELOW the printable-ASCII range
# (33..126) so every token byte stamped into a region binarizes to
# foreground: at a higher cut, digits '0'/'1'/'2' (48..50) would vanish
# from decoded tokens and numbers containing them would be corrupted
# (the >9999 range-rejection would never actually fire).
BIN_THRESHOLD = 32
MIN_AREA = 50       # min region area, px (symbol_detector.py:148,207)

# reference golden vocabulary (OCR/results/cadastral_output.csv) + dirty
# variants that exercise the cleanup chain (detect.py:474-487)
NAME_POOL = [
    "Aadahal", "Al Khurd", "Devapur", "Konal", "Gonal",
    "Benakanahalli", "Hirebidari", "Kavalur", "Mundaragi", "Tumba",
    "Shirol", "Hallikeri", "Yelburga", "Kukanur", "Binnal",
    "al khurd!", "DEVAPUR", "gonal.", "Kava@lur", "shirol,",
]
NOISE_POOL = ["N", "S", "E", "W", "7A", "A7", "x", "9Z"]
WORD_POOL = (
    "survey boundary village plot owner parcel field river road bridge "
    "temple school tank well forest hill stream canal border stone"
).split()
# blue-ink water labels (reference blue family, OCR/src/detect.py:299-330)
WATER_POOL = ["River", "Lake", "Pond", "Tank", "Stream", "Canal", "Jheel"]

TEXT_H, TEXT_W = 72, 128      # normal payload canvas
BIG_H, BIG_W = 240, 320       # multi-region skew payload canvas
HUGE_H, HUGE_W = 648, 896     # oversized scan canvas (> MAX_UNTILED: tiled)
HIRES_H, HIRES_W = 640, 1152  # over-cap canvas (> RESIZE_CAP: P1 decimates)

# ---- RGB ink-colored scans (media://rgb/): white paper, colored ink.
# Fill colors sit inside the colormask.COLOR_THRESHOLDS bands; the token
# byte is stamped into the GREEN channel of the token row, so the
# derived gray grid (see derive_gray_from_rgb) reuses the standard
# byte-tokenizer convention unchanged.
RGB_INKS = {"red": (180, 40, 40), "black": (40, 40, 40), "blue": (40, 40, 180)}
RGB_FILL_G = 40  # green value marking "ink fill" (token bytes are never 40)

# ---- gradient-lit low-contrast scans (media://lowc/): background ramps
# 20..64 left-to-right (defeats a global min-max stretch: most of the
# background binarizes foreground at BIN_THRESHOLD), ink fill at a
# constant level, token bytes stored in the HIGH band [162, 255] as
# byte + LOWC_TOKEN_SHIFT so they stay above the fill after the
# tile-local equalization recovers the mask.
LOWC_BG_LO, LOWC_BG_HI = 20, 64
# fill must sit BELOW LOWC_TOKEN_BASE: fill pixels then map to the FILL
# sentinel in the token grid. (At 176 — inside the token band — every
# fill pixel decoded to '/', raw tokens were slash-padded, and conf
# silently depended on region geometry via the stripped padding.)
LOWC_FILL = 150
LOWC_TOKEN_BASE = 162   # pixels >= this carry a token byte
LOWC_TOKEN_SHIFT = 129  # stored value = token byte + shift


# ------------------------------------------------------------- payloads
def media_payload(media_ref: str) -> bytes:
    """Pure function media_ref -> payload bytes.

    Families by ref prefix:
      media://        clean gray scan (CM01 container)
      media://big/    multi-region skew payload
      media://huge/   oversized scan (> MAX_UNTILED: exercises tiling)
      media://neg/    DEGRADED scan: 1-px scratches attached to region
                      tops (removed by the P3 morph-open) + inverted
                      polarity (undone by the P2 inversion)
      media://rot/    whole-grid rotation by 1.5-2.5 deg (exercises the
                      P4 deskew end to end)
      media://lowc/   gradient-lit low-contrast scan (exercises the P2
                      tile-local equalization; a global stretch fails)
      media://rgb/    RGB PNG, white paper + colored ink (exercises the
                      P5/P6 color masks and red/black/blue routing)
      media://hires/  over-RESIZE_CAP scan whose glyphs are stamped on
                      the decimation-surviving pixel lattice (exercises
                      the P1 resize cap end to end, then tiling)
      media://i7/X    the SAME scan as media://X (any family above),
                      delivered as an Adam7-interlaced PNG instead of
                      its native container — the wire-format invariance
                      family: extraction output must not depend on the
                      payload encoding
    """
    if media_ref.startswith("media://i7/"):
        from .functions.png import encode_png_adam7

        gray, img = decode_payload_any(
            media_payload("media://" + media_ref[len("media://i7/") :])
        )
        return encode_png_adam7(img if img is not None else gray)
    if media_ref.startswith("media://rgb/"):
        return _rgb_payload(media_ref)
    rng = random.Random("payload:" + media_ref)
    if media_ref.startswith("media://lowc/"):
        grid = _lowc_grid(rng)
        return MAGIC + struct.pack(">HH", *grid.shape) + grid.tobytes()
    if media_ref.startswith("media://hires/"):
        grid = _hires_grid(rng)
        return MAGIC + struct.pack(">HH", *grid.shape) + grid.tobytes()
    huge = media_ref.startswith("media://huge/")
    big = media_ref.startswith("media://big/") or huge
    neg = media_ref.startswith("media://neg/")
    rot = media_ref.startswith("media://rot/")
    h, w = (HUGE_H, HUGE_W) if huge else (BIG_H, BIG_W) if big else (TEXT_H, TEXT_W)
    cell_h, cell_w = 24, 32
    rows, cols = h // cell_h, w // cell_w
    grid = np.zeros((h, w), dtype=np.uint8)
    region_boxes: list[tuple[int, int]] = []

    cells = [(r, c) for r in range(rows) for c in range(cols)]
    rng.shuffle(cells)
    n_regions = rng.randint(16, min(40, len(cells))) if big else rng.randint(1, 5)
    n_regions = min(n_regions, len(cells))

    prev_token: str | None = None
    for idx in range(n_regions):
        r, c = cells[idx]
        y0, x0 = r * cell_h + 2, c * cell_w + 2
        # token: 40% number, 35% name, 15% noise lookalike, 10% repeat
        u = rng.random()
        if u < 0.10 and prev_token is not None:
            token = prev_token
        elif u < 0.50:
            token = str(rng.randint(1, 12000))  # some exceed 9999 -> rejected
        elif u < 0.85:
            token = rng.choice(NAME_POOL)
        else:
            token = rng.choice(NOISE_POOL)
        prev_token = token
        tb = token.encode("ascii")
        rw = max(len(tb) + 2, rng.randint(8, cell_w - 4))
        rw = min(rw, cell_w - 4)
        tb = tb[: rw - 2]
        rh = rng.randint(max(4, (MIN_AREA + rw - 1) // rw), cell_h - 4)
        grid[y0 : y0 + rh, x0 : x0 + rw] = FILL
        grid[y0 + 1, x0 + 1 : x0 + 1 + len(tb)] = np.frombuffer(tb, dtype=np.uint8)
        region_boxes.append((y0, x0))

    # sub-min-area noise blobs + speckles in unused cells
    cursor = n_regions
    end = min(cursor + rng.randint(1, 3), len(cells))
    while cursor < end:
        r, c = cells[cursor]
        cursor += 1
        y0, x0 = r * cell_h + 3, c * cell_w + 3
        side = rng.randint(2, 6)  # area 4..36 < MIN_AREA
        grid[y0 : y0 + side, x0 : x0 + side] = FILL
    # thin line strokes ("transport lines") in further unused cells;
    # all are sub-MIN_AREA (max ~36 px), so span outputs are unaffected
    # — they feed the line path (mediapath.extract_line_segments):
    # horizontal / vertical / 45-degree staircase diagonals, sometimes
    # doubled with a close parallel companion (exercises the W5 merge)
    end = min(cursor + rng.randint(0, 3), len(cells))
    while cursor < end:
        r, c = cells[cursor]
        cursor += 1
        y0, x0 = r * cell_h + 2, c * cell_w + 2
        u = rng.random()
        if u < 0.30:  # horizontal, len 16..28
            ln = rng.randint(16, cell_w - 4)
            yy = y0 + rng.randint(0, cell_h - 10)
            grid[yy, x0 : x0 + ln] = FILL
            if rng.random() < 0.5:  # parallel companion 3 px below
                grid[yy + 3, x0 : x0 + rng.randint(15, ln)] = FILL
        elif u < 0.55:  # vertical, len 16..20
            ln = rng.randint(16, cell_h - 4)
            xx = x0 + rng.randint(0, cell_w - 10)
            grid[y0 : y0 + ln, xx] = FILL
            if rng.random() < 0.3:
                grid[y0 : y0 + rng.randint(15, ln), xx + 3] = FILL
        else:  # 45-degree staircase (2 px per row, corners shared so
            # the stroke is one 4-connected component)
            d = rng.randint(12, min(cell_h, cell_w) - 6)
            down = rng.random() < 0.5
            for t in range(d):
                yy = y0 + t if down else y0 + d - 1 - t
                grid[yy, x0 + t : x0 + t + 2] = FILL
    # stamped map symbols (J1 fixtures): scaled instances of the glyph
    # template set, like the reference's datasets/symbols sheet. They
    # decode no token (FILL-only), so the token path skips them; the
    # template-match operator is what finds them.
    from .templates import scaled_template

    end = min(cursor + rng.randint(0, 2), len(cells))
    while cursor < end:
        r, c = cells[cursor]
        cursor += 1
        name = rng.choice(["settlement", "temple", "well"])
        mask = scaled_template(name, rng.choice([0.75, 1.0, 1.25]))
        mh, mw = mask.shape
        y0, x0 = r * cell_h + 3, c * cell_w + 3
        grid[y0 : y0 + mh, x0 : x0 + mw][mask] = FILL
    for _ in range(rng.randint(0, 4)):
        y, x = rng.randrange(h), rng.randrange(w)
        if grid[y, x] == 0 and not (grid[max(y-1,0):y+2, max(x-1,0):x+2] > 0).any():
            grid[y, x] = FILL

    if neg:
        # 1-px vertical scratches attached to region tops (into the
        # 2-px cell margin) — morph-open must strip them to recover
        # the clean bbox/center
        for y0, x0 in region_boxes:
            if rng.random() < 0.6:
                grid[max(y0 - 2, 0) : y0, x0 + 2] = FILL
        grid = 255 - grid  # polarity flip (negative scan)
    if rot:
        grid = _rotate_nn(grid, rng.choice([-2.5, -1.5, 1.5, 2.5]))

    return MAGIC + struct.pack(">HH", h, w) + grid.tobytes()


def _rotate_nn(grid: np.ndarray, angle_deg: float) -> np.ndarray:
    """Generation-side nearest-neighbour rotation about the center (any
    deterministic resampling works here — it defines the fixture; the
    PIPELINE's deskew rotation is mirrored separately by the oracle)."""
    import math

    h, w = grid.shape
    rad = math.radians(angle_deg)
    cos, sin = math.cos(rad), math.sin(rad)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ys, xs = np.mgrid[0:h, 0:w]
    xr = cos * (xs - cx) + sin * (ys - cy) + cx
    yr = -sin * (xs - cx) + cos * (ys - cy) + cy
    xi = np.rint(xr).astype(np.int64)
    yi = np.rint(yr).astype(np.int64)
    valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.zeros_like(grid)
    out[valid] = grid[yi[valid], xi[valid]]
    return out


def _lowc_grid(rng: random.Random) -> np.ndarray:
    """Gradient-lit low-contrast canvas: bg ramps LOWC_BG_LO..HI along
    x, regions filled at LOWC_FILL, token bytes in the high band."""
    h, w = TEXT_H, TEXT_W
    ramp = (
        LOWC_BG_LO + (LOWC_BG_HI - LOWC_BG_LO) * np.arange(w) // max(w - 1, 1)
    ).astype(np.uint8)
    grid = np.tile(ramp, (h, 1))
    cell_h, cell_w = 24, 32
    cells = [(r, c) for r in range(h // cell_h) for c in range(w // cell_w)]
    rng.shuffle(cells)
    n_regions = rng.randint(2, min(6, len(cells)))
    for idx in range(n_regions):
        r, c = cells[idx]
        y0, x0 = r * cell_h + 2, c * cell_w + 2
        u = rng.random()
        if u < 0.50:
            token = str(rng.randint(1, 12000))
        elif u < 0.85:
            token = rng.choice(NAME_POOL)
        else:
            token = rng.choice(NOISE_POOL)
        tb = token.encode("ascii")
        rw = max(len(tb) + 2, rng.randint(8, cell_w - 4))
        rw = min(rw, cell_w - 4)
        tb = tb[: rw - 2]
        rh = rng.randint(max(4, (MIN_AREA + rw - 1) // rw), cell_h - 4)
        grid[y0 : y0 + rh, x0 : x0 + rw] = LOWC_FILL
        grid[y0 + 1, x0 + 1 : x0 + 1 + len(tb)] = (
            np.frombuffer(tb, dtype=np.uint8).astype(np.int64) + LOWC_TOKEN_SHIFT
        ).clip(0, 255).astype(np.uint8)
    # sub-min-area blobs (still rejected after equalization)
    cursor = n_regions
    end = min(cursor + rng.randint(0, 2), len(cells))
    while cursor < end:
        r, c = cells[cursor]
        cursor += 1
        y0, x0 = r * cell_h + 3, c * cell_w + 3
        side = rng.randint(2, 6)
        grid[y0 : y0 + side, x0 : x0 + side] = LOWC_FILL
    return grid


def _hires_grid(rng: random.Random) -> np.ndarray:
    """Over-cap canvas whose glyphs SURVIVE the P1 NN decimation.

    Stamping works in decimated coordinate space: the region layout,
    token bytes, and noise blobs are chosen exactly like the big
    family but on the post-cap lattice, then mapped back to the hires
    canvas via the pipeline's own decimation indices — region rects
    fill every hires pixel between their mapped corners (so the
    decimated view is a solid rect) and each token byte lands on the
    one surviving pixel of its decimated cell. After the cap the grid
    is still > MAX_UNTILED, so the payload then exercises tiling too
    (P1 -> E3 composition, the 100 TB scan shape)."""
    from .operators.normalize import RESIZE_CAP, decimation_indices

    h, w = HIRES_H, HIRES_W
    ii, jj = decimation_indices(h, w, RESIZE_CAP)
    nh, nw = len(ii), len(jj)
    grid = np.zeros((h, w), dtype=np.uint8)
    cell_h, cell_w = 24, 32
    cells = [(r, c) for r in range(nh // cell_h) for c in range(nw // cell_w)]
    rng.shuffle(cells)
    n_regions = min(rng.randint(16, 40), len(cells))
    for idx in range(n_regions):
        r, c = cells[idx]
        y0, x0 = r * cell_h + 2, c * cell_w + 2  # decimated coords
        u = rng.random()
        if u < 0.50:
            token = str(rng.randint(1, 12000))
        elif u < 0.85:
            token = rng.choice(NAME_POOL)
        else:
            token = rng.choice(NOISE_POOL)
        tb = token.encode("ascii")
        rw = max(len(tb) + 2, rng.randint(8, cell_w - 4))
        rw = min(rw, cell_w - 4)
        tb = tb[: rw - 2]
        rh = rng.randint(max(4, (MIN_AREA + rw - 1) // rw), cell_h - 4)
        grid[ii[y0] : ii[y0 + rh - 1] + 1, jj[x0] : jj[x0 + rw - 1] + 1] = FILL
        grid[ii[y0 + 1], jj[x0 + 1 : x0 + 1 + len(tb)]] = np.frombuffer(
            tb, dtype=np.uint8
        )
    # sub-min-area noise blobs (in decimated space), mapped the same way
    cursor = n_regions
    end = min(cursor + rng.randint(0, 3), len(cells))
    while cursor < end:
        r, c = cells[cursor]
        cursor += 1
        y0, x0 = r * cell_h + 3, c * cell_w + 3
        side = rng.randint(2, 6)
        grid[ii[y0] : ii[y0 + side - 1] + 1, jj[x0] : jj[x0 + side - 1] + 1] = FILL
    return grid


def _rgb_payload(media_ref: str) -> bytes:
    """White-paper RGB scan with colored-ink regions, PNG-encoded.

    Ink color drives classification (reference OCR/src/detect.py:226-330:
    red = survey numbers, black = names, blue = water). ~25% of regions
    are cross-stamped (content that the color family's validator must
    REJECT, e.g. a name in red ink) so color routing is observable in
    the golden span invariant.
    """
    from .functions.png import encode_png_rgb

    rng = random.Random("payload:" + media_ref)
    h, w = TEXT_H, TEXT_W
    img = np.full((h, w, 3), 255, dtype=np.uint8)
    cell_h, cell_w = 24, 32
    cells = [(r, c) for r in range(h // cell_h) for c in range(w // cell_w)]
    rng.shuffle(cells)
    n_regions = rng.randint(2, min(6, len(cells)))
    for idx in range(n_regions):
        r, c = cells[idx]
        y0, x0 = r * cell_h + 2, c * cell_w + 2
        family = rng.choice(["red", "black", "blue"])
        cross = rng.random() < 0.25
        if family == "red":
            token = rng.choice(NAME_POOL) if cross else str(rng.randint(1, 12000))
        elif family == "black":
            token = str(rng.randint(1, 9999)) if cross else rng.choice(NAME_POOL)
        else:
            token = str(rng.randint(1, 9999)) if cross else rng.choice(WATER_POOL)
        tb = token.encode("ascii")
        rw = max(len(tb) + 2, rng.randint(8, cell_w - 4))
        rw = min(rw, cell_w - 4)
        tb = tb[: rw - 2]
        rh = rng.randint(max(4, (MIN_AREA + rw - 1) // rw), cell_h - 4)
        img[y0 : y0 + rh, x0 : x0 + rw] = RGB_INKS[family]
        img[y0 + 1, x0 + 1 : x0 + 1 + len(tb), 1] = np.frombuffer(tb, dtype=np.uint8)
    cursor = n_regions
    end = min(cursor + rng.randint(0, 2), len(cells))
    while cursor < end:  # colored sub-min-area noise
        r, c = cells[cursor]
        cursor += 1
        y0, x0 = r * cell_h + 3, c * cell_w + 3
        side = rng.randint(2, 6)
        img[y0 : y0 + side, x0 : x0 + side] = RGB_INKS[
            rng.choice(["red", "black", "blue"])
        ]
    return encode_png_rgb(img)


def decode_payload(payload: bytes) -> np.ndarray:
    """payload bytes -> uint8 grid (the media path's 'image decode')."""
    if payload[:4] != MAGIC:
        raise ValueError("bad payload magic")
    h, w = struct.unpack(">HH", payload[4:8])
    return np.frombuffer(payload[8:], dtype=np.uint8).reshape(h, w)


def derive_gray_from_rgb(img: np.ndarray) -> np.ndarray:
    """RGB scan -> the gray grid the byte tokenizer reads: white paper
    -> 0 (background), ink fill (green == RGB_FILL_G) -> FILL, token
    pixels -> their green-channel byte. Pure per-pixel rule, part of
    the fixture-decode contract shared with the oracle."""
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    white = (r == 255) & (g == 255) & (b == 255)
    return np.where(
        white, np.uint8(0), np.where(g == RGB_FILL_G, np.uint8(FILL), g)
    ).astype(np.uint8)


def decode_payload_any(payload: bytes) -> tuple[np.ndarray, np.ndarray | None]:
    """payload bytes -> (gray grid, rgb image or None).

    PNG payloads decode via the real codec (functions/png.py); RGB ones
    additionally return the color image for ink routing. CM01 container
    payloads return the raw gray grid. Shared fixture-decode layer —
    the DATAFLOW over the arrays is what pipeline and oracle implement
    twice."""
    from .functions.png import decode_png, is_png

    if is_png(payload):
        img = decode_png(payload)
        if img.ndim == 2:
            return img, None
        return derive_gray_from_rgb(img), img
    return decode_payload(payload), None


# ------------------------------------------------------------ documents
def _text_span(rng: random.Random) -> str:
    """Markup-bearing text content: content lines, boilerplate, scripts."""
    lines: list[str] = []
    for _ in range(rng.randint(1, 5)):
        kind = rng.random()
        if kind < 0.5:  # content line, >= 5 words
            words = [rng.choice(WORD_POOL) for _ in range(rng.randint(5, 12))]
            body = " ".join(words)
            if rng.random() < 0.4:
                body = f"<p>{body}</p>"
            if rng.random() < 0.3:
                body = f"<div class='c'>{body}</div>"
            lines.append(body)
        elif kind < 0.7:  # short nav boilerplate (fails word count)
            items = [
                f'<a href="/{w}">{w.title()}</a>'
                for w in rng.sample(WORD_POOL, rng.randint(2, 4))
            ]
            lines.append(" | ".join(items))
        elif kind < 0.85:  # long link-farm line (fails link density)
            items = [
                f'<a href="/{w}">{w} {rng.choice(WORD_POOL)}</a>'
                for w in rng.sample(WORD_POOL, rng.randint(4, 6))
            ]
            lines.append(" ".join(items))
        elif kind < 0.95:  # script/style block, possibly multi-line
            if rng.random() < 0.5:
                lines.append(f"<script>var x = {rng.randint(0, 99)};</script>")
            else:
                lines.append("<script>\nfunction f() { return 1; }\n</script>")
        else:  # short content line (fails word count)
            lines.append(" ".join(rng.choice(WORD_POOL) for _ in range(rng.randint(1, 4))))
    return "\n".join(lines)


def gen_doc(
    seed: int, i: int, skew_frac: float = 0.01, max_spans: int = 64
) -> dict:
    """Generate document i: pure function of (seed, i)."""
    rng = random.Random(f"doc:{seed}:{i}")
    doc_id = "doc-%012d" % i
    is_skew = rng.random() < skew_frac
    n_spans = max_spans if is_skew else rng.randint(1, 12)
    spans = []
    for off in range(n_spans):
        if rng.random() < 0.30:  # media span
            if is_skew:
                # mostly multi-region big scans; some oversized ones
                # that exceed MAX_UNTILED (tiling) or RESIZE_CAP (P1)
                u2 = rng.random()
                if u2 < 0.10:
                    prefix = "media://huge/"
                elif u2 < 0.15:
                    prefix = "media://hires/"
                else:
                    prefix = "media://big/"
            else:
                u2 = rng.random()
                if u2 < 0.15:  # degraded negative scan
                    prefix = "media://neg/"
                elif u2 < 0.32:  # colored-ink RGB scan (routing)
                    prefix = "media://rgb/"
                elif u2 < 0.44:  # gradient-lit low-contrast scan
                    prefix = "media://lowc/"
                elif u2 < 0.56:  # rotated scan (deskew)
                    prefix = "media://rot/"
                else:
                    prefix = "media://"
            ref = f"{prefix}{doc_id}/{off}"
            spans.append(
                {"kind": "media", "text": None, "media_ref": ref, "offset": off}
            )
        else:
            spans.append(
                {
                    "kind": "text",
                    "text": _text_span(rng),
                    "media_ref": None,
                    "offset": off,
                }
            )
    return {"doc_id": doc_id, "spans": spans}


DOCS_ARROW = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field(
            "spans",
            pa.list_(
                pa.struct(
                    [
                        pa.field("kind", pa.string()),
                        pa.field("text", pa.string()),
                        pa.field("media_ref", pa.string()),
                        pa.field("offset", pa.int32()),
                    ]
                )
            ),
        ),
    ]
)


def docs_batch(seed: int, ids: list[int], skew_frac: float, max_spans: int) -> pa.RecordBatch:
    docs = [gen_doc(seed, i, skew_frac, max_spans) for i in ids]
    return pa.RecordBatch.from_pylist(docs, schema=DOCS_ARROW)


def synth_docs_df(
    spark,
    n_docs: int,
    seed: int = 42,
    skew_frac: float = 0.01,
    max_spans: int = 64,
    partitions: int | None = None,
):
    """Distributed generation: spark.range -> mapInArrow(gen).

    Each task generates its own id range; nothing funnels through the
    driver, so this scales to any corpus size.
    """
    from pyspark.sql import DataFrame

    parts = partitions or max(spark.sparkContext.defaultParallelism, 4)

    def gen(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            ids = batch.column("id").to_pylist()
            for lo in range(0, len(ids), 256):
                yield docs_batch(seed, ids[lo : lo + 256], skew_frac, max_spans)

    rng_df = spark.range(0, n_docs, 1, parts)
    out: DataFrame = rng_df.mapInArrow(gen, schema="doc_id string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>")
    return out


def synth_docs_pylist(
    n_docs: int, seed: int = 42, skew_frac: float = 0.01, max_spans: int = 64
) -> list[dict]:
    """Driver-side generation for small test corpora."""
    return [gen_doc(seed, i, skew_frac, max_spans) for i in range(n_docs)]


# ------------------------------------------------------------- ground truth
# Fixture-layer GT perturbation for the evaluation family (S5/J2).
# Pure Python and engine-neutral: the SAME rows feed the Spark side (as
# a createDataFrame ground-truth table — the faithful shape for a GT
# annotation source, validate_detection.py:25-31) and the oracle's
# independent matcher. Deterministic via blake2b so no Spark expression
# is involved in fixture generation.

import hashlib as _hashlib


def _gt_hash(doc_id: str, offset: int, idx: int, salt: str, mod: int) -> int:
    h = _hashlib.blake2b(
        f"{doc_id}|{offset}|{idx}|{salt}".encode(), digest_size=8
    ).digest()
    return int.from_bytes(h, "big") % mod


def perturb_gt(det_rows: list[dict]) -> list[dict]:
    """Detection rows -> perturbed ground-truth boxes.

    Jitter up to (+-3, +-2) px on a 10x4 box (IoUs ~0.21..1.0, straddling
    the 0.2/0.3 category thresholds), drop ~10% (those detections become
    FPs), duplicate ~12.5% far away at idx+1000 (unmatched GT -> FNs).
    Input rows: doc_id, offset, category, idx, x, y, w, h [, conf].
    """
    out: list[dict] = []
    for r in det_rows:
        key = (r["doc_id"], r["offset"], r["idx"])
        if _gt_hash(*key, "drop", 10) != 0:
            out.append(
                {
                    "doc_id": r["doc_id"], "offset": r["offset"],
                    "category": r["category"], "idx": r["idx"],
                    "x": r["x"] + (_gt_hash(*key, "jx", 7) - 3),
                    "y": r["y"] + (_gt_hash(*key, "jy", 5) - 2),
                    "w": r["w"], "h": r["h"],
                }
            )
        if _gt_hash(*key, "extra", 8) == 0:
            out.append(
                {
                    "doc_id": r["doc_id"], "offset": r["offset"],
                    "category": r["category"], "idx": r["idx"] + 1000,
                    "x": r["x"] + 30, "y": r["y"] + 15,
                    "w": r["w"], "h": r["h"],
                }
            )
    return out


def wav_payload(media_ref: str) -> bytes:
    """Deterministic PCM WAV fixture bytes for a media://wav/ ref:
    a sine at a ref-derived frequency, 8- or 16-bit, mono or stereo —
    exercises every decode path of functions/wav.py."""
    from .functions.wav import encode_wav

    h = _hashlib.blake2b(media_ref.encode(), digest_size=8).digest()
    rng = random.Random(int.from_bytes(h, "big"))
    n = 256 + rng.randrange(512)
    freq = 2 + rng.randrange(12)
    wave = np.sin(2 * np.pi * freq * np.arange(n) / n)
    if rng.random() < 0.5:
        samples = (wave * 12000).astype(np.int16)
    else:
        samples = (wave * 100 + 128).astype(np.uint8)
    if rng.random() < 0.5:
        samples = np.stack([samples, samples[::-1]], axis=1)
    return encode_wav(samples, sample_rate=4000 + 100 * rng.randrange(40))
