"""The flagship extraction plan (reference EP1, OCR/src/detect.py:1466-1571,
re-expressed as one lazy DataFrame graph — SURVEY.md §3).

    docs ──posexplode(spans)──┬─ text spans ── strip_boilerplate (codegen)
                              └─ media spans ─ repartition by (doc_id,offset)
                                               └ mapInArrow extract ─ dedup
                              union ── groupBy(doc_id) re-zip ── extracted

Shuffle budget: exactly two wide stages — the per-span repartition that
spreads skewed (huge-span) documents across tasks, and the
groupBy(doc_id) for dedup + re-zip. AQE coalesces/splits post-shuffle
partitions at runtime (session.py turns it on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_detections
from ..operators.mediapath import media_detections
from ..operators.rezip import rezip
from ..operators.textpath import text_detections


def explode_spans(docs: DataFrame) -> DataFrame:
    """docs -> one row per span (narrow; no shuffle)."""
    return docs.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )


def extract(docs: DataFrame, spread_media: bool = True) -> DataFrame:
    """Full pipeline: docs -> extracted(doc_id, spans)."""
    spans = explode_spans(docs)

    text_rows = text_detections(spans.filter(F.col("kind") == "text"))

    media_spans = spans.filter(F.col("kind") == "media")
    if spread_media:
        # skew handling: key the expensive stateless stage per-span, not
        # per-doc, so a 10k-span document doesn't pin one task
        # (SURVEY.md §4.3); dedup later re-groups on unsalted doc_id.
        spark = docs.sparkSession
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        media_spans = media_spans.repartition(n, "doc_id", "offset")
    media_rows = dedup_detections(media_detections(media_spans))

    detections = text_rows.unionByName(media_rows)
    return rezip(detections, doc_ids_df=docs.select("doc_id"))
