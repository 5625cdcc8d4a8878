"""JSONL event-log source: round-trip parity, malformed-line handling,
and replay-equivalence when the pipeline ingests from a JSONL dump.

Reference parity: the FCD/LCD JSON payload readers
(`/root/reference/collector/fcd/fcd.go`), re-expressed as a schema-pinned
JSON scan with PERMISSIVE dead-lettering instead of per-row decoding.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cosmwasm_etl_spark.sources.eventlog import (
    read_event_log,
    read_event_log_jsonl,
    synthetic_events,
    write_event_log,
    write_event_log_jsonl,
)

N = 3000


@pytest.fixture(scope="module")
def events(spark):
    return synthetic_events(spark, N, n_urls=400, events_per_epoch=500, seed=13)


def _key(df):
    return sorted(
        (r.seq, r.epoch, r.op, r.url, str(r.warc_ts), r.html, r.lang)
        for r in df.collect()
    )


def test_jsonl_roundtrip_parity_with_parquet(spark, tmp_path, events):
    """write_jsonl -> read_jsonl must equal the parquet log byte-for-byte:
    seq/epoch/op/url/lang, microsecond timestamps, and binary html
    (base64 round-trip, including the generator's undecodable-bytes rows)."""
    pq, js = str(tmp_path / "pq"), str(tmp_path / "js")
    write_event_log(events, pq, range_partitions=4)
    write_event_log_jsonl(events, js, range_partitions=4)
    assert _key(read_event_log_jsonl(spark, js, on_malformed="fail")) == _key(
        read_event_log(spark, pq)
    )


def test_jsonl_quarantine_dead_letters_bad_lines(spark, tmp_path, events):
    """Unparsable lines and lines missing required fields land in the bad
    side with their raw text; clean rows are unaffected."""
    js = str(tmp_path / "js")
    write_event_log_jsonl(events.limit(50), js, range_partitions=1)
    extra = os.path.join(js, "part-extra.json")
    with open(extra, "w") as f:
        f.write('{"seq": 1, "epoch": 0, "op": "update", "url":\n')  # truncated JSON
        f.write('{"seq": null, "epoch": 0, "op": "update", "url": "u", "warc_ts": "2026-01-01T00:00:00.000000Z"}\n')
        f.write("not json at all\n")
    good, bad = read_event_log_jsonl(spark, js, on_malformed="quarantine")
    assert good.count() == 50
    bad_lines = [r.raw_line for r in bad.collect()]
    assert len(bad_lines) == 3
    assert any("not json at all" in b for b in bad_lines)
    # required-field-null line is dead-lettered even though it parsed
    assert any('"op":"update"' in b.replace(" ", "") and '"url":"u"' in b.replace(" ", "") for b in bad_lines)


def test_jsonl_failfast_raises_on_missing_required(spark, tmp_path):
    js = str(tmp_path / "js")
    os.makedirs(js)
    with open(os.path.join(js, "a.json"), "w") as f:
        f.write('{"epoch": 0, "op": "update", "url": "u", "warc_ts": "2026-01-01T00:00:00.000000Z"}\n')
    with pytest.raises(ValueError, match="required"):
        read_event_log_jsonl(spark, js, on_malformed="fail")


def test_jsonl_replay_equivalence(spark, tmp_path, events):
    """The pipeline applied from a JSONL dump converges to the same table
    state as from the parquet log (the source format must not leak into
    CDC semantics)."""
    from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table

    js = str(tmp_path / "js")
    write_event_log_jsonl(events, js, range_partitions=4)
    loaded = read_event_log_jsonl(spark, js, on_malformed="fail")
    t = create_pages_table(spark, str(tmp_path / "pages"), num_buckets=8)
    pipe = CdcPipeline(spark, t, str(tmp_path / "work"))
    pipe.run_replay(loaded, epochs_per_batch=2)
    assert pipe.audit(events).count() == 0


def test_cdc_ingest_job_jsonl_format(spark, tmp_path, events):
    """jobs/cdc_ingest.py --events-format jsonl: replay from a JSONL dump in
    a separate process, dead-letter bad lines under work/, converge to the
    same state the raw events define (cross-process audit)."""
    import json
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    js = str(tmp_path / "events_js")
    small = events.filter(F.col("epoch") < 2)  # 2 epochs = quick job
    write_event_log_jsonl(small, js, range_partitions=2)
    with open(os.path.join(js, "part-bad.json"), "w") as f:
        f.write("definitely not json\n")
    table_dir, work_dir = str(tmp_path / "pages"), str(tmp_path / "work")
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_GRAFT_SHUFFLE"] = "8"
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "cdc_ingest.py"),
            "--events", js, "--events-format", "jsonl",
            "--table", table_dir, "--work", work_dir,
            "--mode", "replay", "--epochs-per-batch", "1", "--num-buckets", "8",
        ],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-3000:]}"
    summary = json.loads(
        [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")][-1]
    )
    assert summary["mode"] == "replay" and summary["applied"] >= 1

    from cosmwasm_etl_spark.lakehouse import LakeTable
    from cosmwasm_etl_spark.plans.pipeline import CdcPipeline

    table = LakeTable.load(spark, table_dir)
    pipe = CdcPipeline(spark, table, work_dir)
    assert pipe.audit(small).count() == 0
    dead = spark.read.parquet(os.path.join(work_dir, "jsonl_dead_letter"))
    assert [r.raw_line for r in dead.collect()] == ["definitely not json"]


def test_cdc_ingest_job_jsonl_refused_for_streaming(tmp_path):
    import subprocess
    import sys

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "cdc_ingest.py"),
            "--events", str(tmp_path), "--events-format", "jsonl",
            "--table", str(tmp_path / "t"), "--work", str(tmp_path / "w"),
            "--mode", "stream",
        ],
        capture_output=True, text=True, timeout=60,
    )
    assert proc.returncode == 2  # argparse error, before any Spark startup
    assert "replay only" in proc.stderr
