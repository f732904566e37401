"""Driver contract for the spark-graft builder (PySpark target).

entry()      — flagship extraction pipeline over sf0.001 documents
               re-shaped into the interleaved docs table.
queries()    — one entry per implemented operator (SURVEY.md §2),
               from cadastral_map_ocr_system_spark.plans.queries.
oracle_sql() — DuckDB-runnable ANSI SQL equivalents (same column
               names/types; md5-based hashing and decimal/rounding
               pinned on both sides). Every query has one: the
               genuinely non-SQL ops (mapInArrow media extraction,
               order-dependent greedy dedup) materialize the
               INDEPENDENT single-process oracle's rows to parquet and
               their SQL selects those, so the hash comparison is a
               pipeline-equals-oracle check.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from cadastral_map_ocr_system_spark.plans.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: interleaved text+media extraction over sf0.001 docs.

    Each source document becomes one interleaved doc: its text as a
    text span plus one synthetic media span; the pipeline strips
    boilerplate, runs the media region-extract + classify + dedup, and
    re-zips spans in source order.
    """
    from cadastral_map_ocr_system_spark.plans.pipeline import extract

    docs_src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs_src.select(
        F.concat(F.lit("doc-"), F.col("doc_id").cast("string")).alias("doc_id"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.col("text").alias("text"),
                F.lit(None).cast("string").alias("media_ref"),
                F.lit(0).cast("int").alias("offset"),
            ),
            F.struct(
                F.lit("media").alias("kind"),
                F.lit(None).cast("string").alias("text"),
                F.concat(
                    F.lit("media://doc-"), F.col("doc_id").cast("string"), F.lit("/1")
                ).alias("media_ref"),
                F.lit(1).cast("int").alias("offset"),
            ),
        ).alias("spans"),
    )
    out = extract(docs)
    return out.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.order").alias("order"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in REGISTRY.items() if sql is not None}
