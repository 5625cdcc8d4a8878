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
