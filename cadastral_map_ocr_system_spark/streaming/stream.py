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


def stream_dedup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    stream_checkpoint: str,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "1 hour",
):
    """Streaming exact dedup on ingest: keep the first row per key
    among arrivals within the watermark delay of each other
    (dropDuplicatesWithinWatermark) — the streaming counterpart of
    corpus_dedup.exact_dedup_survivors.

    The contract that makes this run forever in bounded state: per-key
    state is EVICTED once the watermark passes the key's event time
    plus the delay — dedup-within-horizon, not global dedup (global
    streaming dedup is unbounded state by definition; a 100 TB/day
    ingest needs the horizon form, with a periodic batch exact_dedup
    pass downstream for the long tail). Past the horizon, a same-key
    row with a fresh event time is re-emitted, and a bit-identical
    late copy is dropped by the watermark's late-data filter — either
    way no state survives the horizon. State DOES survive
    query restarts via the streaming checkpoint, so duplicates
    spanning two drains of the same checkpoint still dedup
    (test-pinned in tests/test_operators.py).
    """
    events = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_path)
    deduped = events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        list(keys)
    )
    return (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_path)
        .start()
    )


def stream_interval_join(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    stream_checkpoint: str,
    left_type: str = "view",
    right_type: str = "purchase",
    max_gap_minutes: int = 30,
    watermark: str = "1 hour",
):
    """Stream-stream inner interval join: pair each `right_type` event
    with the same user's `left_type` events in the preceding
    `max_gap_minutes` (the view->purchase attribution join).

    Both sides carry a watermark and the join predicate carries an
    explicit event-time range — the two things that let Spark bound
    the join state: a buffered left row is evicted once the right
    watermark passes its ts + gap, so state is O(events within the
    horizon), not O(stream). Without the time-range condition this
    would be an unbounded stateful join that OOMs by construction on
    an endless stream — the range is load-bearing, not a filter.
    """
    events = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_path)
    left = (
        events.filter(F.col("event_type") == left_type)
        .select(
            F.col("event_id").alias("left_id"),
            F.col("user_id").alias("left_user"),
            F.col("ts").alias("left_ts"),
        )
        .withWatermark("left_ts", watermark)
    )
    right = (
        events.filter(F.col("event_type") == right_type)
        .select(
            F.col("event_id").alias("right_id"),
            F.col("user_id").alias("right_user"),
            F.col("ts").alias("right_ts"),
        )
        .withWatermark("right_ts", watermark)
    )
    joined = left.join(
        right,
        (F.col("left_user") == F.col("right_user"))
        & (F.col("left_ts") <= F.col("right_ts"))
        & (
            F.col("right_ts")
            <= F.col("left_ts") + F.expr(f"INTERVAL {max_gap_minutes} MINUTES")
        ),
        "inner",
    ).select(
        F.col("left_id"),
        F.col("right_id"),
        F.col("left_user").alias("user_id"),
        ((F.col("right_ts").cast("long") - F.col("left_ts").cast("long")))
        .alias("gap_sec"),
    )
    return (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_path)
        .start()
    )


SESSION_GAP_MS = 1_800_000  # same 30-min rule as the batch sessionize


def _sessionize_group(key, pdfs, state):
    """Per-user session state machine for applyInPandasWithState.

    State = the one OPEN session (start_ms, last_ms, n_events). Events
    arriving in a batch merge into it / close it by the gap rule;
    every CLOSED session is emitted immediately (append mode). The open
    session registers an event-time timeout at last_ms + gap: when the
    watermark passes it, the session is final by construction — no
    on-time event can extend it — so it is emitted and state removed.
    Bounded state per user (3 longs), regardless of stream length.
    """
    import numpy as np
    import pandas as pd

    user_id = key[0]

    def frame(rows):
        return pd.DataFrame(
            rows, columns=["user_id", "start_ms", "end_ms", "n_events"]
        )

    if state.hasTimedOut:
        start_ms, last_ms, n = state.get
        state.remove()
        yield frame([(user_id, start_ms, last_ms, n)])
        return

    pdf = pd.concat(list(pdfs), ignore_index=True)
    ms = np.sort(pdf["ts"].astype("int64").to_numpy() // 1_000_000)
    # split into gap-delimited runs: starts[i]..ends[i] index segments
    breaks = np.nonzero(np.diff(ms) > SESSION_GAP_MS)[0] + 1
    starts = np.concatenate(([0], breaks))
    ends = np.concatenate((breaks, [len(ms)]))

    # each run is a dense interval [start, end, n]; the stored open
    # session is one too. Sorting ALL intervals by start and chain-
    # merging (next.start - cur.end <= gap, overlap included) is the
    # batch gap rule over the union — an out-of-order (within-
    # watermark) event earlier than the stored last_ms now widens the
    # open session instead of regressing its end/timeout, and the
    # stored span can bridge batch runs that are far apart from each
    # other but each within gap of it (ADVICE r5 high).
    runs = [
        [int(ms[s]), int(ms[e - 1]), int(e - s)]
        for s, e in zip(starts, ends)
    ]
    if state.exists:
        start_ms, last_ms, n = state.get
        runs.append([int(start_ms), int(last_ms), int(n)])
        runs.sort(key=lambda r: (r[0], r[1]))
    merged = [runs[0]]
    for r in runs[1:]:
        cur = merged[-1]
        if r[0] - cur[1] <= SESSION_GAP_MS:
            cur[1] = max(cur[1], r[1])
            cur[2] += r[2]
        else:
            merged.append(r)
    closed = [(user_id, a, b, c) for a, b, c in merged[:-1]]
    a, b, c = merged[-1]
    state.update((a, b, c))
    state.setTimeoutTimestamp(b + SESSION_GAP_MS)
    yield frame(closed)


def stream_sessionize(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    stream_checkpoint: str,
    watermark: str = "30 minutes",
):
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user sessionization with the batch gap rule, event-time
    timeouts closing idle sessions as the watermark advances. The
    grouped state is the only shuffle; emitted sessions append to a
    parquet sink exactly once."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    events = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_path)
    sessions = (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=(
                "user_id bigint, start_ms bigint, end_ms bigint, n_events bigint"
            ),
            stateStructType="start_ms bigint, last_ms bigint, n_events bigint",
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", stream_checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_path)
        .start()
    )
