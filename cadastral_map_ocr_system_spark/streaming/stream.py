"""Structured Streaming wrapper: readStream(docs) -> extract -> sink.

Uses foreachBatch so the exact batch plan (plans/pipeline.extract) runs
per micro-batch — one code path for batch and streaming, which is the
only way to keep span-sequence equality guarantees identical in both
modes. Exactly-once at the sink comes from the micro-batch epoch id +
idempotent partition overwrite, same mechanism as the batch
checkpointing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.pipeline import extract


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
        (
            extract(batch_df)
            .write.mode("append")
            .parquet(output_path)
        )

    writer = (
        docs_stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", stream_checkpoint)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
