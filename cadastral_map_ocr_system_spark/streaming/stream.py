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


EVENTS_STREAM_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def stream_windowed_counts(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    stream_checkpoint: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
):
    """Event-time tumbling-window aggregation with a watermark over a
    streamed events directory: count + exact decimal sum per
    (window, event_type), append-mode parquet sink.

    Append mode emits each window row EXACTLY ONCE — when the watermark
    (max event time seen minus the delay) passes the window end — and
    evicts its state, so unbounded event time runs in bounded state at
    any scale; events arriving later than the delay are dropped, which
    is the documented late-data contract. The watermark itself lives in
    the streaming checkpoint, so emission semantics survive query
    restarts (q_stream_windows drives this across three availableNow
    drains of one checkpoint).

    The sum runs in DECIMAL before the final cast: a float sum over a
    shuffled 100 TB stream is not reproducible across partitionings;
    decimal is exact and order-independent.
    """
    events = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_path)
    agg = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("win_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_path)
        .start()
    )
