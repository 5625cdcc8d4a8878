"""S2/S4/S6 analogs: per-epoch failover reader and paged backfill scan.

Mirrors the reference's fallback contract
(`parser/dex/srcstore/collector_datastore.go:24-74`): fallback covers
absence only; gaps in both replicas are errors; and the FCD offset/limit
paging loop (`collector/terra/fcd/fcdepo.go:50-60`): bounded pages,
resumable cursor, exact partition of the seq space.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cosmwasm_etl_spark.sources.eventlog import synthetic_events, write_event_log
from cosmwasm_etl_spark.sources.failover import (
    iter_event_log_pages,
    read_event_log_failover,
)

N_EVENTS = 2_000
EPB = 200  # -> epochs 0..9


@pytest.fixture(scope="module")
def replicas(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("failover")
    full = synthetic_events(spark, N_EVENTS, n_urls=300, events_per_epoch=EPB)
    fb_path = os.path.join(base, "replica_b")
    write_event_log(full, fb_path, range_partitions=8)
    # primary is missing epochs 3-4 and 7 (a contiguous outage + a stray gap)
    prim_path = os.path.join(base, "replica_a")
    write_event_log(
        full.where(~F.col("epoch").isin(3, 4, 7)), prim_path, range_partitions=8
    )
    empty_path = os.path.join(base, "replica_empty")  # never written
    return {"full": fb_path, "holey": prim_path, "empty": empty_path}


def _fingerprint(df):
    """Order-insensitive content hash over (seq, op, url, len(html))."""
    return (
        df.select(
            F.xxhash64("seq", "op", "url", F.length("html"), "warc_ts").alias("rh")
        )
        .agg(F.expr("bit_xor(rh)").alias("h"), F.count("*").alias("n"))
        .collect()[0]
    )


def test_failover_fills_primary_gaps(spark, replicas):
    merged = read_event_log_failover(
        spark, replicas["holey"], replicas["full"], require_epochs=range(0, 10)
    )
    full = spark.read.parquet(replicas["full"])
    assert _fingerprint(merged) == _fingerprint(full)
    # no epoch is double-read: per-epoch counts match the canonical log
    got = {
        r["epoch"]: r["n"]
        for r in merged.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    want = {
        r["epoch"]: r["n"]
        for r in full.groupBy("epoch").agg(F.count("*").alias("n")).collect()
    }
    assert got == want


def test_failover_missing_primary_reads_all_from_fallback(spark, replicas):
    merged = read_event_log_failover(spark, replicas["empty"], replicas["full"])
    full = spark.read.parquet(replicas["full"])
    assert _fingerprint(merged) == _fingerprint(full)


def test_failover_gap_in_both_raises(spark, replicas):
    # both replicas lack epoch 10+
    with pytest.raises(ValueError, match="missing from both"):
        read_event_log_failover(
            spark, replicas["holey"], replicas["full"], require_epochs=range(0, 12)
        )


def test_failover_no_data_anywhere_raises(spark, replicas):
    with pytest.raises(ValueError, match="either replica"):
        read_event_log_failover(spark, replicas["empty"], replicas["empty"] + "2")


def test_failover_fallback_scan_is_pruned(spark, replicas):
    """The fallback side must carry a pushed-down epoch range predicate —
    at 10^10 scale reading the whole fallback replica to recover 3 epochs
    would be the bug."""
    merged = read_event_log_failover(
        spark, replicas["holey"], replicas["full"], require_epochs=range(0, 10)
    )
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "epoch" in plan


def test_paged_scan_partitions_seq_space_exactly(spark, replicas):
    full = spark.read.parquet(replicas["full"])
    pages = list(iter_event_log_pages(spark, replicas["full"], page_size_seqs=512))
    assert len(pages) == (N_EVENTS + 511) // 512
    counts = [p.count() for p, _ in pages]
    assert sum(counts) == N_EVENTS
    assert all(c <= 512 for c in counts)
    union = pages[0][0]
    for p, _ in pages[1:]:
        union = union.unionByName(p)
    assert _fingerprint(union) == _fingerprint(full)


def test_paged_scan_resumes_from_cursor(spark, replicas):
    pages = list(iter_event_log_pages(spark, replicas["full"], page_size_seqs=512))
    _, cursor = pages[1]  # pretend we committed through page 2
    resumed = list(
        iter_event_log_pages(
            spark, replicas["full"], page_size_seqs=512, start_seq=cursor
        )
    )
    assert len(resumed) == len(pages) - 2
    assert sum(p.count() for p, _ in resumed) == N_EVENTS - 2 * 512


def test_paged_scan_is_pruned(spark, replicas):
    """Each page's plan must push the seq BETWEEN to the scan — the log is
    range-partitioned by seq, so a page reads only its files."""
    page, _ = next(iter(iter_event_log_pages(spark, replicas["full"], page_size_seqs=512)))
    plan = page._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "seq" in plan
