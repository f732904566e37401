"""Per-document greedy dedup — exact reference semantics.

The reference's dedup is order-dependent greedy: sort detections by
confidence desc, keep the first, drop any later row that is "the same"
as a survivor (OCR/src/detect.py:384-417 text; 504-536 fuzzy names via
Jaccard char-set similarity; 538-575 numbers via value+spatial
proximity). Because the keep/drop decision for row k depends on the
set of survivors so far, this is NOT expressible as a row_number
window or a pure self-join (SURVEY.md §2.6 W1-W3) — it runs as an
``applyInPandas`` grouped map per doc_id, with a pinned total order
(conf desc, offset, region_idx, token_idx) so results are
deterministic under any physical row order.

Scale: the group payload is one document's detections — bounded by
spans x regions per doc, never corpus-sized; the shuffle key is the
unsalted doc_id (salting is only applied to the stateless media stage
upstream, SURVEY.md §7.4 hard part 6).
"""

from __future__ import annotations

import pandas as pd

from ..functions.geometry import DEDUP_MAX_DIST, DEDUP_NUM_DELTA, DEDUP_SIM_THRESHOLD
from ..functions.similarity import jaccard_charset

_DEDUP_SCHEMA = (
    "doc_id string, offset int, region_idx int, token_idx int, "
    "kind string, text string, media_ref string, conf double, "
    "cx double, cy double, is_number boolean"
)


def _dedup_doc(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy dedup of one document's media detections.

    Names: drop if a survivor in the same payload (offset) has
    char-set Jaccard > 0.8 and center distance < 30 px
    (detect.py:398-411, 504-536). Numbers: drop if a survivor number in
    the same payload differs by <= 1 and is < 30 px away
    (detect.py:538-575). Survivor order: conf desc, then
    (offset, region_idx, token_idx) asc — ties broken deterministically.
    """
    pdf = pdf.sort_values(
        ["conf", "offset", "region_idx", "token_idx"],
        ascending=[False, True, True, True],
        kind="mergesort",
    )
    kept_idx: list[int] = []
    kept_rows: list[tuple] = []  # (offset, is_number, text, cx, cy)
    for i, row in enumerate(
        pdf[["offset", "is_number", "text", "cx", "cy"]].itertuples(index=False)
    ):
        off, is_num, text, cx, cy = row
        dup = False
        for k_off, k_is_num, k_text, k_cx, k_cy in kept_rows:
            if k_off != off or k_is_num != is_num:
                continue
            dx, dy = cx - k_cx, cy - k_cy
            if dx * dx + dy * dy >= DEDUP_MAX_DIST * DEDUP_MAX_DIST:
                continue
            if is_num:
                if abs(int(text) - int(k_text)) <= DEDUP_NUM_DELTA:
                    dup = True
                    break
            else:
                if jaccard_charset(text, k_text) > DEDUP_SIM_THRESHOLD:
                    dup = True
                    break
        if not dup:
            kept_idx.append(i)
            kept_rows.append(row)
    return pdf.iloc[kept_idx]


def dedup_detections(detections_df):
    """groupBy(doc_id).applyInPandas greedy dedup (W1-W3, J3)."""
    return detections_df.groupBy("doc_id").applyInPandas(
        lambda pdf: _dedup_doc(pdf), schema=_DEDUP_SCHEMA
    )
