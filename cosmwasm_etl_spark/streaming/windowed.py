"""Event-time windowed aggregation with watermarked late-data handling.

The reference's aggregator finalizes interval-aligned rollups once the
interval boundary has passed (`aggregator/scheduler.go:28-66` — tasks fire
at each Truncate(interval)+interval boundary; `scheduler.go:88-92` aligns
the frame). In a distributed stream "the boundary has passed" must be an
*event-time* decision, not wall-clock: this module re-expresses it as a
pure Structured Streaming plan — ``withWatermark`` + tumbling
``F.window`` aggregation in append mode, so a window row is emitted
exactly once, when the watermark passes its end, and events arriving
later than the allowed lateness are dropped by the state store instead of
corrupting an already-published window (the reference never re-opens a
published frame either; its catch-up loop only moves forward,
`scheduler.go:60-67`).

Unlike the ``foreachBatch`` incremental aggregates in
``aggregates.py`` (which maintain a mergeable state table and can
back-fill), this surface is fully engine-managed: state lives in the
streaming state store under the checkpoint, scales out with shuffle
partitions, and restarts resume from the checkpoint. Use this shape for
high-cardinality per-window rollups where per-key state must be evicted
by watermark; use the foreachBatch shape when windows must remain
re-openable (late back-fill) or queryable mid-flight.

All aggregates are built-ins (count / sum / min / max) — streaming-safe,
map-side-combined, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cosmwasm_etl_spark.sources.eventlog import read_event_log_stream


def windowed_lang_stats(
    events: DataFrame,
    window: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling per-(window, lang) event stats over a *streaming* events
    DataFrame. Append-mode compatible: emitted once the watermark passes
    window end; rows later than ``watermark`` are dropped by the state
    store (counted nowhere — the quarantine path is for undecodable rows,
    late rows are a correctness-policy drop, same as the reference's
    forward-only frames).

    Exact lateness semantics (Spark 3.4+, SPARK-40925): stateful operators
    filter late input with the PREVIOUS micro-batch's watermark and evict
    state with the CURRENT one, so a row arriving in the batch immediately
    after its window sealed still merges into that window's final emission;
    only rows >= 2 batches behind the watermark are dropped (verified in
    tests/test_streaming_windowed.py). Size ``watermark`` to the source's
    real delivery skew, not to zero."""
    return (
        events.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.when(F.col("op") == "delete", 1).otherwise(0)).alias("n_deletes"),
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_events",
            "n_deletes",
            "min_seq",
            "max_seq",
        )
    )


def run_windowed_stats_stream(
    spark: SparkSession,
    events_path: str,
    out_path: str,
    checkpoint_dir: str,
    window: str = "30 minutes",
    watermark: str = "10 minutes",
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 600,
) -> None:
    """Run the watermarked window rollup over everything currently in the
    event log (AvailableNow) into an append-only parquet sink.

    Exactly-once: the parquet sink's manifest log + the streaming
    checkpoint make re-runs idempotent; a window row is published at most
    once because append mode only emits state the watermark has sealed.
    Windows still open when the available data is exhausted stay in the
    checkpointed state store and are emitted by the next run that advances
    the watermark past them — the streaming analog of the reference's
    "wait for the boundary, then fire" scheduler loop."""
    stream = read_event_log_stream(spark, events_path, max_files_per_trigger)
    q = (
        windowed_lang_stats(stream, window=window, watermark=watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup of redelivered events within the watermark
    horizon (``dropDuplicatesWithinWatermark``): the at-least-once tail of
    a CDC log can redeliver an event file after a source hiccup; keyed
    state evicted by the watermark bounds memory, unlike a plain
    ``dropDuplicates`` whose state grows forever. The lakehouse epoch
    commit already makes *batch-level* redelivery idempotent; this guards
    the *row-level* case where a redelivered slice is merged into a
    differently-bounded batch."""
    keys = keys or ["seq"]
    return events.withWatermark("warc_ts", watermark).dropDuplicatesWithinWatermark(keys)


def session_update_stats(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-url *session* windows (gap-based): a burst of change events to
    the same url with < ``gap`` between consecutive events is one session
    — the streaming shape for "re-crawl storm" detection over a CDC tail
    (hot-domain skew shows up as long, dense sessions). Engine-managed
    session merging via ``F.session_window``; append mode emits a session
    only once the watermark passes its close, so a session row is final
    when published."""
    return (
        events.withWatermark("warc_ts", watermark)
        .groupBy(F.session_window("warc_ts", gap).alias("w"), "url")
        .agg(
            F.count("*").alias("n_events"),
            F.min("seq").alias("first_seq"),
            F.max("seq").alias("last_seq"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "url",
            "n_events",
            "first_seq",
            "last_seq",
        )
    )
