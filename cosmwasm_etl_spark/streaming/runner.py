"""Structured Streaming runner: tail the event-log directory and apply each
micro-batch through the CDC pipeline.

The reference's collector/parser poll loops
(`/root/reference/collector/collector.go:48-95`,
`/root/reference/parser/dex/dex.go:141`) become ``readStream`` +
``foreachBatch``:

- ``Trigger.AvailableNow`` = bounded replay (the parser's catch-up mode);
  continuous triggers = steady-state tailing (the 5s poll loop,
  `cmd/parser/dex/main.go:54`);
- ``maxFilesPerTrigger`` = backpressure (T11 pacing analog);
- the streaming checkpoint tracks *source* offsets (files consumed), while
  the lakehouse commit's epoch id + watermark make the *sink* idempotent —
  together they give end-to-end exactly-once even if a batch is re-delivered
  after a crash (the streaming batch id is deterministic per checkpoint,
  exactly like the reference's synced-height CAS).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from cosmwasm_etl_spark.plans.pipeline import CdcPipeline
from cosmwasm_etl_spark.sources.eventlog import read_event_log_stream


def run_stream_available_now(
    spark: SparkSession,
    pipeline: CdcPipeline,
    events_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    timeout_sec: int = 600,
) -> list[dict]:
    """Consume everything currently in the event log via Structured
    Streaming micro-batches, applying each through the pipeline. Returns
    per-batch stats. Restart-safe: source offsets come from the checkpoint,
    sink idempotency from the lakehouse epoch commits."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    stats: list[dict] = []

    def handle(batch_df, batch_id: int) -> None:
        stats.append(pipeline.apply_batch(batch_df, int(batch_id)))

    stream = read_event_log_stream(spark, events_path, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
    return stats


class StallError(RuntimeError):
    """No-new-data stall (T7): the analog of the reference's ErrNoNewHeight
    (`parser/dex/dex.go:367-377`) — raised when ``stall_after`` consecutive
    triggers deliver zero events, so an operator/alert layer can distinguish
    'source is idle or broken' from 'pipeline is slow'. Carries the
    per-batch ``stats`` applied before the stall (work done up to the
    stall is committed and must not be lost to the caller)."""

    def __init__(self, msg: str, stats: list[dict] | None = None):
        super().__init__(msg)
        self.stats = stats or []


def run_stream_processing_time(
    spark: SparkSession,
    pipeline: CdcPipeline,
    events_path: str,
    checkpoint_dir: str,
    trigger_seconds: float = 5.0,
    max_files_per_trigger: int | None = None,
    stall_after: int = 3,
    stop_after_batches: int | None = None,
    timeout_sec: int = 600,
) -> list[dict]:
    """Steady-state tailing (T7): processing-time trigger — the reference's
    5 s poll loop (`cmd/parser/dex/main.go:54`) — with no-new-data stall
    detection. Each non-empty micro-batch goes through the full exactly-once
    apply; ``stall_after`` consecutive empty triggers raise :class:`StallError`
    after stopping the query (the reference returns ErrNoNewHeight and lets
    the runner decide). ``stop_after_batches`` bounds the run for tests."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    stats: list[dict] = []

    def handle(batch_df, batch_id: int) -> None:
        stats.append(pipeline.apply_batch(batch_df, int(batch_id)))

    stream = read_event_log_stream(spark, events_path, max_files_per_trigger)
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
    import time

    # Stall detection watches StreamingQueryProgress, NOT foreachBatch:
    # an idle file source emits progress events with numInputRows == 0 but
    # never invokes foreachBatch, so batch-side counting cannot see a stall.
    deadline = time.time() + timeout_sec
    empty_streak = 0
    seen_ts: set[str] = set()
    try:
        while time.time() < deadline:
            lp = q.lastProgress
            if lp and lp.get("timestamp") not in seen_ts:
                seen_ts.add(lp["timestamp"])
                if int(lp.get("numInputRows", 0) or 0) == 0:
                    empty_streak += 1
                else:
                    empty_streak = 0
            if empty_streak >= stall_after:
                raise StallError(
                    f"no new events for {stall_after} consecutive triggers "
                    f"({stall_after * trigger_seconds:.0f}s)",
                    stats,
                )
            if stop_after_batches is not None and len(stats) >= stop_after_batches:
                break
            if not q.isActive:
                break
            time.sleep(min(trigger_seconds / 4, 1.0))
    finally:
        q.stop()
        q.awaitTermination(30)
    return stats
