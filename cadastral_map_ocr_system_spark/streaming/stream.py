"""Structured Streaming wrapper: readStream(docs) -> extract -> sink.

Uses foreachBatch so the exact batch plan (plans/pipeline.extract) runs
per micro-batch — one code path for batch and streaming, which is the
only way to keep span-sequence equality guarantees identical in both
modes. Exactly-once at the sink comes from the micro-batch epoch id +
idempotent partition overwrite: output is partitioned by epoch_id and
each epoch dynamically overwrites ONLY its own partition, so a replayed
micro-batch rewrites rather than duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.pipeline import extract


def write_epoch(batch_df: DataFrame, epoch_id: int, output_path: str) -> None:
    """Exactly-once micro-batch sink: extract the batch and overwrite
    ONLY this epoch's partition (dynamic mode). A retried epoch after a
    crash between sink write and offset commit REPLACES its own
    partition instead of appending duplicates — idempotent under
    replay (unit-pinned in tests/test_operators.py)."""
    spark = batch_df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (
        extract(batch_df)
        .withColumn("epoch_id", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .partitionBy("epoch_id")
        .parquet(output_path)
    )


def stream_extract(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    stream_checkpoint: str,
    trigger_once: bool = True,
):
    """Tail a parquet docs directory and extract each micro-batch.

    trigger_once=True drains what is present and stops (test mode);
    False runs continuously.
    """
    docs_stream = (
        spark.readStream.schema(
            "doc_id string, spans array<struct<kind:string,text:string,"
            "media_ref:string,offset:int>>"
        )
        .parquet(input_path)
    )

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        write_epoch(batch_df, epoch_id, output_path)

    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
