"""Property-based tests (SURVEY.md §5 step 7) over the scalar rule
layer and kernels — hypothesis-driven, no Spark session needed."""

from __future__ import annotations

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from cadastral_map_ocr_system_spark.functions import text as T
from cadastral_map_ocr_system_spark.functions.similarity import jaccard_charset
from cadastral_map_ocr_system_spark.operators.mediapath import extract_regions
from cadastral_map_ocr_system_spark.operators.nms import py_nms
from cadastral_map_ocr_system_spark.synth import decode_payload, media_payload

printable = st.text(alphabet=string.printable, max_size=200)
ascii_word = st.text(
    alphabet=string.ascii_letters + string.digits + " .-", max_size=60
)


@given(ascii_word)
@settings(max_examples=300)
def test_clean_idempotent(s):
    once = T.py_clean_token(s)
    assert T.py_clean_token(once) == once


@given(printable)
@settings(max_examples=300)
def test_strip_boilerplate_idempotent_on_clean_output(s):
    once = T.py_strip_boilerplate(s)
    # output of the strip is tag-free single-line content; stripping
    # again never removes more
    assert T.py_strip_boilerplate(once) == once


@given(printable, printable)
@settings(max_examples=200)
def test_jaccard_symmetric_bounded(a, b):
    s = jaccard_charset(a, b)
    assert 0.0 <= s <= 1.0
    assert s == jaccard_charset(b, a)


@given(st.text(alphabet=string.digits, min_size=1, max_size=6))
def test_number_predicate_matches_int_range(s):
    want = s.isdigit() and len(s) <= 4 and 1 <= int(s) <= 9999
    assert T.py_is_valid_number(s) == want


@given(st.integers(0, 10_000_000), st.integers(0, 63))
def test_payload_roundtrip_and_region_decode(doc, off):
    """Every synthesized payload decodes; every extracted region token
    is printable ASCII; centers lie inside the canvas."""
    ref = f"media://doc-{doc:012d}/{off}"
    grid = decode_payload(media_payload(ref))
    for reg in extract_regions(grid):
        assert all(33 <= ord(c) <= 126 for c in reg["token"])
        assert 0 <= reg["cx"] <= grid.shape[1]
        assert 0 <= reg["cy"] <= grid.shape[0]
        assert reg["area"] >= 50


@given(
    st.lists(
        st.tuples(
            st.integers(0, 50), st.integers(0, 50),
            st.integers(1, 20), st.integers(1, 20),
            st.floats(0.0, 1.0, allow_nan=False),
        ),
        max_size=12,
    )
)
def test_nms_keeps_subset_and_is_stable(items):
    boxes = [(x, y, w, h) for x, y, w, h, _ in items]
    confs = [c for *_, c in items]
    kept = py_nms(boxes, confs)
    assert set(kept) <= set(range(len(boxes)))
    # survivors are mutually non-overlapping beyond the threshold
    from cadastral_map_ocr_system_spark.functions.geometry import py_iou

    for i in kept:
        for j in kept:
            if i < j:
                assert py_iou(boxes[i], boxes[j]) <= 0.3 + 1e-9
    # idempotent: NMS of survivors keeps all survivors
    assert py_nms([boxes[i] for i in kept], [confs[i] for i in kept]) == list(
        range(len(kept))
    )


# ----------------------------------------------- normalization kernels
import numpy as np  # noqa: E402

from cadastral_map_ocr_system_spark.operators.mediapath import tile_origins  # noqa: E402
from cadastral_map_ocr_system_spark.operators.normalize import (  # noqa: E402
    invert_if_negative,
    morph_open,
)
from cadastral_map_ocr_system_spark.templates import nn_resize  # noqa: E402

def _grid_from_seed(seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    h, w = rs.randint(1, 40), rs.randint(1, 40)
    return rs.randint(0, 256, size=(h, w), dtype=np.uint8)


grids = st.integers(0, 2**31 - 1).map(_grid_from_seed)


@given(grids)
@settings(max_examples=100)
def test_morph_open_idempotent_and_antiextensive(g):
    m = g > 32
    o = morph_open(m)
    assert (morph_open(o) == o).all()   # idempotent
    assert not (o & ~m).any()           # opening never adds pixels


@given(grids)
@settings(max_examples=100)
def test_invert_if_negative_idempotent_and_dark_majority(g):
    n1 = invert_if_negative(g)
    assert (invert_if_negative(n1) == n1).all()
    assert int((n1 > 127).sum()) * 2 <= n1.size  # normalized: dark majority


@given(grids, st.integers(1, 50), st.integers(1, 50))
@settings(max_examples=100)
def test_nn_resize_preserves_corners_and_values(g, h, w):
    m = g > 100
    r = nn_resize(m, h, w)
    assert r.shape == (h, w)
    assert r[0, 0] == m[0, 0]
    if h >= 2 and w >= 2:  # a 1-cell axis collapses onto the first sample
        assert r[-1, -1] == m[-1, -1]  # endpoint-preserving
    assert (nn_resize(m, *m.shape) == m).all()  # same-size identity


@given(st.integers(1, 5000))
@settings(max_examples=200)
def test_tile_origins_cover(n):
    from cadastral_map_ocr_system_spark.operators.mediapath import (
        TILE_SIZE,
        TILE_STRIDE,
    )

    starts = tile_origins(n)
    assert starts[0] == 0 and starts[-1] + TILE_SIZE >= n
    assert all(b - a == TILE_STRIDE for a, b in zip(starts, starts[1:]))


@given(
    st.integers(0, 2**32 - 1),
    st.integers(8, 80),
    st.integers(8, 90),
)
@settings(max_examples=60, deadline=None)
def test_local_enhance_idempotent_on_any_grid(seed, h, w):
    """Tile-local equalization is idempotent for ARBITRARY uint8 grids,
    not just the lowc fixture family: after one pass every non-flat
    tile has >= p10-mass zeros and a 255 maximum, so the second pass is
    the identity; flat tiles stay 0."""
    import numpy as np

    from cadastral_map_ocr_system_spark.operators.normalize import (
        local_contrast_enhance,
    )

    rng = np.random.RandomState(seed % (2**31))
    g = rng.randint(0, 256, size=(h, w), dtype=np.uint8)
    e = local_contrast_enhance(g)
    assert np.array_equal(local_contrast_enhance(e), e)


@given(st.integers(0, 10**9))
@settings(max_examples=30, deadline=None)
def test_classify_token_routing_consistency(seed):
    """Routing semantics: a category's verdict never contradicts the
    underlying validators, and the no-category fallback is
    content-first (number before name)."""
    import random

    from cadastral_map_ocr_system_spark.functions.text import (
        py_is_valid_name,
        py_is_valid_number,
    )
    from cadastral_map_ocr_system_spark.operators.mediapath import classify_token

    rng = random.Random(seed)
    pool = ["123", "99999", "Konal", "Al Khurd", "N", "7A", "x", "", "0", "9999"]
    tok = rng.choice(pool)
    assert classify_token(tok, "number") == (True if py_is_valid_number(tok) else None)
    for cat in ("name", "water"):
        assert classify_token(tok, cat) == (
            False if py_is_valid_name(tok) else None
        )
    fallback = classify_token(tok, None)
    if py_is_valid_number(tok):
        assert fallback is True
    elif py_is_valid_name(tok):
        assert fallback is False
    else:
        assert fallback is None
