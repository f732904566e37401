"""Offset re-zip: re-interleave text and media results per document.

The reference concatenates per-source result lists (OCR/src/detect.py:391)
and sorts by position at output (OCR/src/extract_symbols.py:67-69).
Generalized (SURVEY.md §2.6 W7): union the two paths' detection rows,
group by doc_id, sort each document's rows by the source-order key
(offset, region_idx, token_idx), and assign a dense 0-based ``order``.

``order`` is derived from the sort key alone — never from physical row
arrival order — so the output is identical at any parallelism
(SURVEY.md §7.4 hard part 2). One shuffle (groupBy doc_id); the
collected array is bounded by one document's output size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rezip(detections_df: DataFrame, doc_ids_df: DataFrame | None = None) -> DataFrame:
    """Detection rows -> extracted(doc_id, spans[(kind,text,media_ref,order)]).

    If doc_ids_df (distinct doc_id) is given, documents whose spans were
    all filtered out still appear with an empty spans array, so output
    row count == input document count.
    """
    grouped = detections_df.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct("offset", "region_idx", "token_idx", "kind", "text", "media_ref")
            )
        ).alias("sorted_spans")
    )
    spans = F.transform(
        F.col("sorted_spans"),
        lambda x, i: F.struct(
            x["kind"].alias("kind"),
            x["text"].alias("text"),
            x["media_ref"].alias("media_ref"),
            i.cast("int").alias("order"),
        ),
    ).alias("spans")
    result = grouped.select("doc_id", spans)
    if doc_ids_df is not None:
        empty = F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,order:int>>"
        )
        result = (
            doc_ids_df.select("doc_id")
            .join(result, "doc_id", "left")
            .select("doc_id", F.coalesce(F.col("spans"), empty).alias("spans"))
        )
    return result
