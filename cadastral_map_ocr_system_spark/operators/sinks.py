"""Reference-format result sinks (K1/K3 + A1/A2 statistics).

The reference emits, per map: a 2-column CSV of (Characters, Numbers)
padded to equal length (OCR/src/detect.py:738-749, 787), a per-category
symbol summary (detect.py:752-783), and a detailed JSON with a
statistics block (detect.py:628-711). These re-expressions produce the
same shapes corpus-wide from the extraction's detection rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def characters_numbers_frame(detections: DataFrame) -> DataFrame:
    """Per-document padded 2-column frame (detect.py:738-749).

    Input: detection rows with (doc_id, kind, text, is_number).
    Output: (doc_id, row_idx, characters, numbers) — names sorted
    alphabetically, numbers ascending (detect.py:533-534, 572-573),
    shorter column padded with '' via full-outer on row rank.
    """
    media = detections.filter(F.col("kind") == "media")
    names = media.filter(~F.col("is_number")).select("doc_id", "text")
    nums = media.filter(F.col("is_number")).select(
        "doc_id", F.col("text").cast("int").alias("num")
    )
    wn = Window.partitionBy("doc_id").orderBy("text")
    wm = Window.partitionBy("doc_id").orderBy("num")
    a = names.select("doc_id", F.row_number().over(wn).alias("row_idx"), "text")
    b = nums.select(
        "doc_id", F.row_number().over(wm).alias("row_idx"),
        F.col("num").cast("string").alias("numtext"),
    )
    return (
        a.join(b, ["doc_id", "row_idx"], "full_outer")
        .select(
            "doc_id",
            "row_idx",
            F.coalesce("text", F.lit("")).alias("characters"),
            F.coalesce("numtext", F.lit("")).alias("numbers"),
        )
    )


def statistics_block(detections: DataFrame) -> DataFrame:
    """Corpus statistics (detect.py:689-696 generalized): per-doc
    totals of names/numbers/text spans + mean confidence (A2/A4)."""
    return detections.groupBy("doc_id").agg(
        F.sum(F.when((F.col("kind") == "media") & ~F.col("is_number"), 1).otherwise(0))
        .cast("long").alias("total_place_names"),
        F.sum(F.when((F.col("kind") == "media") & F.col("is_number"), 1).otherwise(0))
        .cast("long").alias("total_survey_numbers"),
        F.sum(F.when(F.col("kind") == "text", 1).otherwise(0))
        .cast("long").alias("total_text_spans"),
        F.round(F.avg("conf"), 6).alias("mean_confidence"),
    )


def write_iit_csv(detections: DataFrame, path: str) -> None:
    """CSV sink (K1): the padded 2-column frame, partitioned by doc."""
    characters_numbers_frame(detections).write.mode("overwrite").option(
        "header", True
    ).csv(path)


def write_detailed_json(extracted: DataFrame, path: str) -> None:
    """JSON sink (K3): one nested JSON record per document."""
    extracted.write.mode("overwrite").json(path)


def write_training_shards(
    docs: DataFrame, path: str, budget_tokens: int, n_writers: int = 8
) -> None:
    """Training-export sink: the documents laid out exactly as a
    trainer consumes them — parquet partitioned by (writer,
    shard_seq), each shard holding ~budget_tokens tokens of text
    (corpus_sample.pack_shards assignment).

    The shard assignment is deterministic in the DATA (md5 writer
    hash, doc_id pack order), so re-running the export overwrites to
    a byte-identical layout; a trainer's data loader streams shards
    as hive partitions with per-shard token counts known up front.
    The only wide ops are the pack window (W-way parallel) and the
    assignment join back to the text (doc_id equi-join); at corpus
    scale both shuffle once on uniformly-hashed keys.
    """
    from .corpus_sample import pack_shards

    assignment = pack_shards(docs, budget_tokens, n_writers)
    (
        docs.select("doc_id", "text")
        .join(assignment, "doc_id")
        .write.mode("overwrite")
        .partitionBy("writer", "shard_seq")
        .parquet(path)
    )
