"""Watermarked event-time window aggregation + within-watermark dedup.

Semantics under test (the streaming analog of the reference's
forward-only interval scheduler, `aggregator/scheduler.go:28-66`):

- a window row is emitted exactly once, when the watermark passes its end;
- an event arriving later than the allowed lateness does NOT re-open or
  corrupt an already-sealed window — it is dropped;
- re-running the stream with no new data emits nothing (append mode +
  checkpoint = idempotent publication);
- ``dropDuplicatesWithinWatermark`` suppresses row-level redelivery while
  keeping keyed state bounded by the watermark horizon.

Micro-batch order is forced with explicit file mtimes (the file source
processes oldest-first with maxFilesPerTrigger=1), so the watermark
actually advances between files and the late row really is late.
"""

from __future__ import annotations

import glob
import os
import shutil
from datetime import datetime, timedelta

import pytest

from cosmwasm_etl_spark.sources.eventlog import EVENT_SCHEMA, read_event_log_stream
from cosmwasm_etl_spark.streaming.windowed import (
    dedup_within_watermark,
    run_windowed_stats_stream,
)

BASE = datetime(2026, 1, 1, 0, 0, 0)


def _row(seq: int, minutes: float, lang: str = "en", op: str = "insert"):
    return (
        seq,
        0,
        op,
        f"https://h.example.com/p/{seq}",
        BASE + timedelta(minutes=minutes),
        b"<html></html>",
        lang,
    )


def _write_files(spark, src_dir: str, stage_dir: str, files: list[list[tuple]]) -> None:
    """Write each row-list as ONE parquet file in src_dir with strictly
    increasing mtimes so the file stream consumes them in order."""
    os.makedirs(src_dir, exist_ok=True)
    t0 = 1_700_000_000
    for i, rows in enumerate(files):
        stage = os.path.join(stage_dir, f"stage{i}")
        spark.createDataFrame(rows, EVENT_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        part = glob.glob(os.path.join(stage, "part-*.parquet"))[0]
        dst = os.path.join(src_dir, f"{i:03d}.parquet")
        shutil.copy(part, dst)
        os.utime(dst, (t0 + i * 60, t0 + i * 60))


@pytest.fixture()
def wm_dirs(tmp_path):
    return {
        "src": str(tmp_path / "events"),
        "stage": str(tmp_path / "stage"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def test_watermarked_windows_seal_once_and_drop_late(spark, wm_dirs):
    # NOTE on lateness: since the multi-stateful-operator work (Spark 3.4+,
    # SPARK-40925) stateful operators filter LATE rows with the PREVIOUS
    # batch's watermark and evict state with the CURRENT one — so a row is
    # only dropped when it arrives >= 2 batches after the watermark passed
    # it (verified empirically: numRowsDroppedByWatermark stays 0 for a
    # one-batch-late row, which merges into the window it seals).
    files = [
        # batch 0: W0=[00:00,00:30) rows + one W1 row -> watermark 00:40
        [_row(0, 5, "en"), _row(1, 10, "de"), _row(2, 25, "en"), _row(3, 50, "en")],
        # batch 1: W1 row + W2 row -> watermark 01:00 (late-filter wm for
        # the NEXT batch becomes 00:40)
        [_row(5, 55, "de"), _row(6, 70, "en")],
        # batch 2: seq 4 @00:20 is LATE (late-filter wm 00:40, W0 sealed
        # and emitted at batch 1) -> dropped; far-future closer seals W2;
        # the closer's own window stays open in state, never emitted
        [_row(4, 20, "en"), _row(7, 180, "en")],
    ]
    _write_files(spark, wm_dirs["src"], wm_dirs["stage"], files)
    run_windowed_stats_stream(
        spark, wm_dirs["src"], wm_dirs["out"], wm_dirs["ckpt"],
        window="30 minutes", watermark="10 minutes", max_files_per_trigger=1,
    )
    got = {
        (r["window_start"].hour, r["window_start"].minute, r["lang"]): (
            r["n_events"], r["min_seq"], r["max_seq"],
        )
        for r in spark.read.parquet(wm_dirs["out"]).collect()
    }
    assert got == {
        (0, 0, "en"): (2, 0, 2),    # late seq 4 dropped, W0 NOT re-opened
        (0, 0, "de"): (1, 1, 1),
        (0, 30, "en"): (1, 3, 3),
        (0, 30, "de"): (1, 5, 5),
        (1, 0, "en"): (1, 6, 6),    # W2 sealed by the far-future closer
        # the closer's own window [03:00,03:30) is absent: still open
    }


def test_watermarked_rerun_emits_nothing_new(spark, wm_dirs):
    files = [
        [_row(0, 5, "en"), _row(1, 50, "en")],
        [_row(2, 180, "en")],
    ]
    _write_files(spark, wm_dirs["src"], wm_dirs["stage"], files)
    run_windowed_stats_stream(
        spark, wm_dirs["src"], wm_dirs["out"], wm_dirs["ckpt"],
        max_files_per_trigger=1,
    )
    n1 = spark.read.parquet(wm_dirs["out"]).count()
    assert n1 >= 1
    run_windowed_stats_stream(  # same checkpoint, no new files
        spark, wm_dirs["src"], wm_dirs["out"], wm_dirs["ckpt"],
        max_files_per_trigger=1,
    )
    assert spark.read.parquet(wm_dirs["out"]).count() == n1


def test_dedup_within_watermark_suppresses_redelivery(spark, wm_dirs):
    dup = _row(1, 6, "de")
    files = [
        [_row(0, 5, "en"), dup],
        [dup, _row(2, 8, "en")],  # seq 1 redelivered in the next batch
    ]
    _write_files(spark, wm_dirs["src"], wm_dirs["stage"], files)
    stream = read_event_log_stream(spark, wm_dirs["src"], max_files_per_trigger=1)
    q = (
        dedup_within_watermark(stream, keys=["seq"], watermark="30 minutes")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", wm_dirs["out"])
        .option("checkpointLocation", wm_dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    rows = spark.read.parquet(wm_dirs["out"]).select("seq").collect()
    assert sorted(r["seq"] for r in rows) == [0, 1, 2]


def test_session_windows_split_on_gap(spark, wm_dirs):
    """Gap-based sessions: a dense burst is ONE session (end = last event
    + gap); a quiet period > gap starts a new one; sealed sessions are
    emitted exactly once in append mode."""
    from cosmwasm_etl_spark.streaming.windowed import session_update_stats

    u = "https://h.example.com/p/0"

    def row_u(seq, minutes):
        return (seq, 0, "update", u, BASE + timedelta(minutes=minutes), b"", "en")

    files = [
        # burst: 00:00, 00:02, 00:04 (one session), then 00:30 (second)
        [row_u(0, 0), row_u(1, 2), row_u(2, 4), row_u(3, 30)],
        # far-future closer (different url) to push the watermark
        [(9, 0, "update", "https://other/x", BASE + timedelta(minutes=300), b"", "en")],
    ]
    _write_files(spark, wm_dirs["src"], wm_dirs["stage"], files)
    stream = read_event_log_stream(spark, wm_dirs["src"], max_files_per_trigger=1)
    q = (
        session_update_stats(stream, gap="5 minutes", watermark="10 minutes")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", wm_dirs["out"])
        .option("checkpointLocation", wm_dirs["ckpt"])
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    got = {
        (r["session_start"].minute, r["session_end"].minute, r["url"]): (
            r["n_events"], r["first_seq"], r["last_seq"],
        )
        for r in spark.read.parquet(wm_dirs["out"]).collect()
    }
    assert got == {
        (0, 9, u): (3, 0, 2),    # burst merged: [00:00, 00:04+gap)
        (30, 35, u): (1, 3, 3),  # second session after the quiet gap
        # the closer's own session stays open in state: not emitted
    }
