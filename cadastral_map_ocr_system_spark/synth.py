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

import hashlib
import random
import struct
from collections.abc import Iterator

import numpy as np
import pyarrow as pa

MAGIC = b"CM01"
# bump when generator output changes, so cached fixture corpora
# (e.g. the bench corpus under /tmp) are regenerated rather than reused
FIXTURE_VERSION = 3
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

TEXT_H, TEXT_W = 72, 128      # normal payload canvas
BIG_H, BIG_W = 240, 320       # multi-region skew payload canvas
HUGE_H, HUGE_W = 648, 896     # oversized scan canvas (> MAX_UNTILED: tiled)


# ------------------------------------------------------------- payloads
def media_payload(media_ref: str) -> bytes:
    """Pure function media_ref -> payload bytes.

    Refs under media://neg/ are DEGRADED scans: 1-px scratches attached
    to region tops (removed by the P3 morph-open) and inverted polarity
    (undone by the P2 negative-scan inversion) — the normalization
    stage must recover the clean extraction from them.
    """
    rng = random.Random("payload:" + media_ref)
    huge = media_ref.startswith("media://huge/")
    big = media_ref.startswith("media://big/") or huge
    neg = media_ref.startswith("media://neg/")
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

    return MAGIC + struct.pack(">HH", h, w) + grid.tobytes()


def decode_payload(payload: bytes) -> np.ndarray:
    """payload bytes -> uint8 grid (the media path's 'image decode')."""
    if payload[:4] != MAGIC:
        raise ValueError("bad payload magic")
    h, w = struct.unpack(">HH", payload[4:8])
    return np.frombuffer(payload[8:], dtype=np.uint8).reshape(h, w)


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
                # that exceed MAX_UNTILED and exercise tiling for real
                prefix = "media://huge/" if rng.random() < 0.10 else "media://big/"
            elif rng.random() < 0.15:  # degraded negative scan
                prefix = "media://neg/"
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
