"""Text extraction path: boilerplate strip as pure built-in expressions.

Generalizes the reference's "content vs noise" gates (color masks +
confidence threshold + noise regexes, OCR/src/detect.py:366-368,
489-502) to DOM-tag stripping + per-line word-count/link-density
heuristics (SURVEY.md §2.2 B1). The whole stage compiles to Catalyst
expressions inside whole-stage codegen — zero Python in the text hot
path, which at 100 TB is the difference between a scan-bound and a
serialization-bound job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import strip_boilerplate


def text_detections(text_spans_df: DataFrame) -> DataFrame:
    """Exploded text spans (doc_id, offset, text) -> detection rows.

    Spans whose cleaned content is empty are dropped (the reference
    drops empty OCR hits, detect.py:366-368).
    """
    return (
        text_spans_df.select(
            "doc_id",
            "offset",
            strip_boilerplate(F.col("text")).alias("text"),
        )
        .filter(F.length("text") > 0)
        .select(
            "doc_id",
            "offset",
            F.lit(0).alias("region_idx"),
            F.lit(0).alias("token_idx"),
            F.lit("text").alias("kind"),
            "text",
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(1.0).alias("conf"),
            F.lit(0.0).alias("cx"),
            F.lit(0.0).alias("cy"),
            F.lit(False).alias("is_number"),
        )
    )
