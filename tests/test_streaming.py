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


def test_processing_time_trigger_and_stall_detection(spark, tmp_path):
    """T7: steady-state tailing applies live batches; a drained source trips
    the no-new-data stall detector (ErrNoNewHeight analog,
    `parser/dex/dex.go:367-377`)."""
    import threading
    import time

    import pytest
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.streaming.runner import (
        StallError,
        run_stream_processing_time,
    )

    all_events = synthetic_events(spark, 4_000, n_urls=400, events_per_epoch=1_000)
    log_dir = str(tmp_path / "events")
    write_event_log(all_events.filter(F.col("seq") < 2_000), log_dir, range_partitions=2)

    table = create_pages_table(spark, str(tmp_path / "pages"), num_buckets=8)
    pipe = CdcPipeline(spark, table, str(tmp_path / "work"))

    # feed the tail of the log concurrently: the poll loop must pick it up
    def _feed():
        time.sleep(3)
        all_events.filter(F.col("seq") >= 2_000).repartition(2).write.mode(
            "append"
        ).parquet(log_dir)

    feeder = threading.Thread(target=_feed)
    feeder.start()
    try:
        with pytest.raises(StallError):
            # short trigger: consumes both slices, then the drained source
            # trips the stall detector
            run_stream_processing_time(
                spark,
                pipe,
                log_dir,
                str(tmp_path / "ckpt"),
                trigger_seconds=1.0,
                stall_after=3,
                timeout_sec=120,
            )
    finally:
        feeder.join()
    # everything delivered before the stall was applied exactly once
    assert pipe.audit(spark.read.parquet(log_dir)).count() == 0


def test_stateful_latest_wins_change_feed(spark, tmp_path):
    """applyInPandasWithState: per-url winner state across micro-batches —
    a url re-emits only when a batch advances its (warc_ts, seq)."""
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.streaming.stateful import latest_wins_change_feed

    all_events = synthetic_events(spark, 6_000, n_urls=500, events_per_epoch=1_000)
    log_dir = str(tmp_path / "events")
    write_event_log(all_events, log_dir, range_partitions=6)

    stream = spark.readStream.schema(all_events.schema).option(
        "maxFilesPerTrigger", "2"
    ).parquet(log_dir)
    feed = latest_wins_change_feed(stream)

    out: dict[str, tuple] = {}
    batches = []

    def sink(df, bid):
        rows = df.collect()
        batches.append(len(rows))
        for r in rows:
            out[r.url] = (r.warc_ts, r.seq)

    q = (
        feed.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    assert len(batches) >= 2  # several micro-batches flowed through state
    # final state per url == batch latest-wins over the whole log
    from cosmwasm_etl_spark.operators.dedup_window import latest_wins_agg

    expect = {
        r.url: (r.warc_ts, r.seq)
        for r in latest_wins_agg(
            all_events.select("url", "warc_ts", "seq"),
            key="url", order_cols=["warc_ts", "seq"],
        ).collect()
    }
    assert out == expect
