"""Offset re-zip: re-interleave text and media results per document.

The reference concatenates per-source result lists (OCR/src/detect.py:391)
and sorts by position at output (OCR/src/extract_symbols.py:67-69).
Generalized (SURVEY.md §2.6 W7): group detection rows by doc_id, sort
each document's rows by the source-order key (offset, region_idx,
token_idx), and assign a dense 0-based ``order``.

``order`` is derived from the sort key alone — never from physical row
arrival order — so the output is identical at any parallelism
(SURVEY.md §7.4 hard part 2). One shuffle (groupBy doc_id); the
collected array is bounded by one document's output size.

Empty documents are represented by null-kind sentinel rows (from
posexplode_outer): they keep the doc_id alive through the groupBy and
are dropped from the spans array here — cheaper than a corpus-wide
join to re-attach missing doc_ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rezip(detections_df: DataFrame) -> DataFrame:
    """Detection rows -> extracted(doc_id, spans[(kind,text,media_ref,order)])."""
    grouped = detections_df.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("offset", "region_idx", "token_idx", "kind", "text", "media_ref")
            )
        ).alias("sorted_spans")
    )
    real = F.filter(F.col("sorted_spans"), lambda x: x["kind"].isNotNull())
    spans = F.transform(
        real,
        lambda x, i: F.struct(
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("order"),
        ),
    ).alias("spans")
    return grouped.select("doc_id", spans)
