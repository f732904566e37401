"""J1 media-side template matching: invariant parity with the
independent oracle, exact recovery of stamped glyphs, rejection of
token rectangles, and the broadcast end-to-end stage."""

from __future__ import annotations

import numpy as np

from cadastral_map_ocr_system_spark import oracle
from cadastral_map_ocr_system_spark.operators import templatematch as tm
from cadastral_map_ocr_system_spark.synth import FILL, decode_payload, media_payload
from cadastral_map_ocr_system_spark.templates import (
    MATCH_SCALES,
    TEMPLATES,
    scaled_template,
)


def test_kernel_parity_with_oracle():
    for i in range(40):
        for ref in (f"media://doc-{i:012d}/2", f"media://big/doc-{i:012d}/2"):
            grid = decode_payload(media_payload(ref))
            assert tm.match_components(grid) == oracle.template_matches(grid), ref


def test_stamped_glyphs_recovered_exactly():
    """Every template at every scale, stamped on a clean canvas, is
    found at its position with score 1.0 by its own template."""
    for name in TEMPLATES:
        for scale in MATCH_SCALES:
            mask = scaled_template(name, scale)
            mh, mw = mask.shape
            g = np.zeros((64, 64), dtype=np.uint8)
            g[20 : 20 + mh, 30 : 30 + mw][mask] = FILL
            hits = [m for m in tm.match_components(g) if m["template"] == name]
            assert len(hits) == 1, (name, scale, tm.match_components(g))
            m = hits[0]
            assert (m["x"], m["y"], m["w"], m["h"], m["score"]) == (
                30, 20, mw, mh, 1.0,
            )


def test_token_rectangles_rejected():
    g = np.zeros((64, 64), dtype=np.uint8)
    g[10:18, 10:26] = FILL  # a solid token-region rectangle
    g[11, 11:16] = np.frombuffer(b"12345", dtype=np.uint8)
    assert tm.match_components(g) == []


def test_fixture_corpus_contains_all_templates():
    found = set()
    for i in range(120):
        grid = decode_payload(media_payload(f"media://big/doc-{i:012d}/0"))
        found |= {m["template"] for m in tm.match_components(grid)}
    assert found == set(TEMPLATES)


def test_template_sheet_slicing_round_trip():
    """E5: compose a symbol sheet, slice it back -> the exact template
    masks (the reference's sheet -> contour-crop flow,
    symbol_detector.py:35-84)."""
    from cadastral_map_ocr_system_spark.operators.templatematch import (
        compose_template_sheet,
        slice_template_sheet,
    )

    sheet, names = compose_template_sheet()
    sliced = slice_template_sheet(sheet, names)
    assert set(sliced) == set(TEMPLATES)
    for name in names:
        assert (sliced[name] == TEMPLATES[name]).all(), name
    # and the sliced set drives matching identically to the built-ins
    mask = TEMPLATES["well"]
    g = np.zeros((40, 40), dtype=np.uint8)
    g[5 : 5 + mask.shape[0], 5 : 5 + mask.shape[1]][mask] = FILL
    assert tm.match_components(g, sliced) == tm.match_components(g)


def test_broadcast_stage_end_to_end(spark):
    from cadastral_map_ocr_system_spark import synth
    from cadastral_map_ocr_system_spark.operators.templatematch import (
        template_match_features,
    )
    from cadastral_map_ocr_system_spark.plans.pipeline import explode_spans
    from pyspark.sql import functions as F

    docs = synth.synth_docs_df(spark, 80, seed=42, skew_frac=0.05)
    media = explode_spans(docs).filter(F.col("kind") == "media")
    rows = template_match_features(media).collect()
    assert rows, "corpus should contain stamped symbols"
    # spot-check a payload against the driver-side kernel
    r = sorted(rows, key=lambda r: (r["doc_id"], r["offset"], r["match_idx"]))[0]
    grid = decode_payload(media_payload(r["media_ref"]))
    m0 = tm.match_components(grid)[0]
    assert (r["template"], r["x"], r["y"], r["score"]) == (
        m0["template"], m0["x"], m0["y"], m0["score"],
    )
