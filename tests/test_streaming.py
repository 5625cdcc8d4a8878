"""Structured Streaming front-end: AvailableNow replay through foreachBatch,
checkpointed restart (T1/T2/T11 analogs)."""

from __future__ import annotations

from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table
from cosmwasm_etl_spark.sources.eventlog import synthetic_events, write_event_log
from cosmwasm_etl_spark.streaming.runner import run_stream_available_now


def test_stream_available_now_matches_oracle(spark, tmp_path):
    from pyspark.sql import functions as F

    all_events = synthetic_events(spark, 10_000, n_urls=600, events_per_epoch=1_000)
    log_dir = str(tmp_path / "events")
    write_event_log(all_events.filter(F.col("seq") < 8_000), log_dir, range_partitions=8)

    table = create_pages_table(spark, str(tmp_path / "pages"), num_buckets=8)
    pipe = CdcPipeline(spark, table, str(tmp_path / "work"))
    stats = run_stream_available_now(
        spark, pipe, log_dir, str(tmp_path / "ckpt"), max_files_per_trigger=3
    )
    assert len(stats) >= 2  # several micro-batches
    assert pipe.audit(spark.read.parquet(log_dir)).count() == 0

    # restart with same checkpoint: no new data -> no new batches applied
    stats2 = run_stream_available_now(spark, pipe, log_dir, str(tmp_path / "ckpt"))
    applied = [s for s in stats2 if not s.get("skipped")]
    assert applied == []

    # append the next slice of the ordered log; only new files are consumed
    more = all_events.filter(F.col("seq") >= 8_000)
    more.repartition(2).write.mode("append").parquet(log_dir)
    stats3 = run_stream_available_now(spark, pipe, log_dir, str(tmp_path / "ckpt"))
    assert [s for s in stats3 if not s.get("skipped")]
    assert pipe.audit(spark.read.parquet(log_dir)).count() == 0
