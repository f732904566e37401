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


def extract(docs: DataFrame, spread_spans: bool = True) -> DataFrame:
    """Full pipeline: docs -> extracted(doc_id, spans).

    spread_spans: repartition exploded spans on (doc_id, offset) before
    the per-span work. This is the skew/salting stage (SURVEY.md §4.3):
    it spreads a 10k-span document across tasks instead of pinning one,
    and it decouples processing parallelism from input-split count
    (a handful of small parquet files would otherwise serialize the
    whole per-span stage on a few cores). Dedup/re-zip re-group on the
    unsalted doc_id afterwards. Disable only when the scan itself is
    already well-partitioned and skew-free.
    """
    spans = explode_spans(docs)
    if spread_spans:
        spark = docs.sparkSession
        n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        spans = spans.repartition(n, "doc_id", "offset")

    text_rows = text_detections(spans.filter(F.col("kind") == "text"))
    # per-payload greedy dedup happens inside the media batch fn
    # (mediapath.greedy_dedup_payload): the dedup rule only relates
    # detections of one payload, so no grouped shuffle is needed.
    # operators/dedup.dedup_detections remains the grouped-map form for
    # cross-span dedup policies.
    media_rows = media_detections(spans.filter(F.col("kind") == "media"))

    detections = text_rows.unionByName(media_rows)
    return rezip(detections, doc_ids_df=docs.select("doc_id"))
