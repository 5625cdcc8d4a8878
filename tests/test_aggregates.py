"""Incremental aggregator jobs: incremental result == full recompute, across
restarts (aggregator analogs — `aggregator/task.go:143-219`, `:308-394`)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from cosmwasm_etl_spark.aggregates import IncrementalAggregates, WindowedStatsAggregates

HOUR = 3600


def _txs(spark, rows):
    return spark.createDataFrame(
        rows, "key string, height long, ts long, v0 double, v1 double"
    )


def _gen_rows(n=300, keys=5):
    rows = []
    for i in range(n):
        k = f"p{i % keys}"
        height = i // 10
        ts = 1_700_000_000 + height * HOUR // 2
        rows.append((k, height, ts, float((i * 7) % 13) + 0.5, float((i * 3) % 11) + 0.25))
    return rows


def test_lp_history_incremental_equals_full_recompute(spark, tmp_path):
    rows = _gen_rows()
    agg = IncrementalAggregates(spark, str(tmp_path / "agg"))
    # three batches by height range
    for b, (lo, hi) in enumerate([(0, 10), (10, 20), (20, 40)]):
        batch = _txs(spark, [r for r in rows if lo <= r[1] < hi])
        agg.advance_lp_history(batch, batch_id=b)

    got = {
        (r.key, r.height): (round(r.liq0, 6), round(r.liq1, 6))
        for r in agg.lp_history().collect()
    }
    # full recompute: per (key, height) sums, cumulative over heights
    full = _txs(spark, rows).groupBy("key", "height").agg(
        F.sum("v0").alias("d0"), F.sum("v1").alias("d1")
    )
    w = Window.partitionBy("key").orderBy("height").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r.key, r.height): (round(r.l0, 6), round(r.l1, 6))
        for r in full.select(
            "key", "height", F.sum("d0").over(w).alias("l0"), F.sum("d1").over(w).alias("l1")
        ).collect()
    }
    assert got == want


def test_lp_history_replay_is_noop_and_restart_safe(spark, tmp_path):
    rows = _gen_rows(100)
    agg = IncrementalAggregates(spark, str(tmp_path / "agg"))
    b0 = _txs(spark, [r for r in rows if r[1] < 5])
    agg.advance_lp_history(b0, 0)
    n1 = agg.lp_history().count()
    # replayed batch: epoch-checked skip
    res = agg.advance_lp_history(b0, 0)
    assert res["skipped"] and agg.lp_history().count() == n1
    # restart: a NEW IncrementalAggregates over the same dir continues
    agg2 = IncrementalAggregates(spark, str(tmp_path / "agg"))
    agg2.advance_lp_history(_txs(spark, [r for r in rows if r[1] >= 5]), 1)
    assert agg2.lp_history().count() > n1
    res2 = agg2.advance_lp_history(b0, 0)  # old batch replayed after restart
    assert res2["skipped"]


def test_recent_stats_incremental_equals_window_recompute(spark, tmp_path):
    rows = _gen_rows(400, keys=4)
    agg = IncrementalAggregates(spark, str(tmp_path / "agg"), window_hours=8)
    max_ts = max(r[2] for r in rows)
    # advance in 4 batches, each with "now" = its own max ts (sliding)
    hs = sorted({r[1] for r in rows})
    chunks = [hs[i::4] for i in range(4)]  # interleaved: late data lands too
    chunks = [set(c) for c in chunks]
    for b, hset in enumerate(chunks):
        batch = [r for r in rows if r[1] in hset]
        agg.advance_recent(_txs(spark, batch), b, now_ts=max_ts)

    got = {
        r.key: (round(r.vol0, 6), round(r.vol1, 6), r.n_txs)
        for r in agg.recent_stats(now_ts=max_ts).collect()
    }
    cutoff = max_ts - 8 * HOUR
    live = [r for r in rows if r[2] >= cutoff]
    want = {}
    for k, h, ts, v0, v1 in live:
        c = want.setdefault(k, [0.0, 0.0, 0])
        c[0] += v0
        c[1] += v1
        c[2] += 1
    want = {k: (round(a, 6), round(b, 6), n) for k, (a, b, n) in want.items()}
    assert got == want

    # replayed batch cannot double-add
    res = agg.advance_recent(_txs(spark, [r for r in rows if r[1] in chunks[0]]), 0, max_ts)
    assert res["skipped"]
    got2 = {
        r.key: (round(r.vol0, 6), round(r.vol1, 6), r.n_txs)
        for r in agg.recent_stats(now_ts=max_ts).collect()
    }
    assert got2 == want


def test_recent_buckets_expire(spark, tmp_path):
    agg = IncrementalAggregates(spark, str(tmp_path / "agg"), window_hours=2)
    t0 = 1_700_000_000
    agg.advance_recent(_txs(spark, [("k", 1, t0, 1.0, 1.0)]), 0, now_ts=t0)
    agg.advance_recent(
        _txs(spark, [("k", 2, t0 + 3 * HOUR, 2.0, 2.0)]), 1, now_ts=t0 + 3 * HOUR
    )
    # first bucket fell out of the 2h window: stored buckets pruned
    buckets = agg.recent.read().select("bucket_ts").collect()
    assert all(b.bucket_ts >= t0 + HOUR for b in buckets)
    stats = agg.recent_stats(now_ts=t0 + 3 * HOUR).collect()
    assert len(stats) == 1 and stats[0].vol0 == 2.0


def _events_batches(spark, sf_dir, n_batches=4):
    """The sf events table split into deterministic interleaved batches
    (late data lands in every batch — the order-insensitivity case)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    return ev, [
        ev.filter(F.pmod(F.col("event_id"), F.lit(n_batches)) == b)
        for b in range(n_batches)
    ]


def test_pair_stats_30m_incremental_equals_one_shot(spark, sf_dir, tmp_path):
    """Incremental 30-min tumbling pair stats == the driver-verified
    one-shot windowed_stats_30m query, across an arbitrary batch split
    (`aggregator/task.go:396-556` analog)."""
    from cosmwasm_etl_spark.queries import q_windowed_stats_30m

    ev, batches = _events_batches(spark, sf_dir)
    agg = WindowedStatsAggregates(spark, str(tmp_path / "w30"))
    for b, batch in enumerate(batches):
        agg.advance_pair30(batch, batch_id=b)

    got = {
        (r.window_start, r.event_type): (r.n_events, r.n_users, r.sum_value, r.sum_high)
        for r in agg.pair_stats_30m().collect()
    }
    want = {
        (r.window_start, r.event_type): (r.n_events, r.n_users, r.sum_value, r.sum_high)
        for r in q_windowed_stats_30m(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        g, w = got[k], want[k]
        assert g[0] == w[0] and g[1] == w[1], (k, g, w)
        assert abs(g[2] - w[2]) < 1e-4, (k, g, w)
        assert (g[3] is None) == (w[3] is None) and (
            g[3] is None or abs(g[3] - w[3]) < 1e-4
        ), (k, g, w)

    # replayed batch: epoch-checked skip, no double-add
    res = agg.advance_pair30(batches[0], batch_id=0)
    assert res["skipped"]
    again = {
        (r.window_start, r.event_type): r.n_events for r in agg.pair_stats_30m().collect()
    }
    assert again == {k: v[0] for k, v in want.items()}


def test_pair_stats_30m_out_of_order_batches(spark, sf_dir, tmp_path):
    """Batches advanced out of id order must still accumulate fully: the
    merged partial row is current+delta (newest state by construction), so
    the merge is unconditional — an order comparison on batch id would
    silently drop overlapping-key accumulations (regression)."""
    from cosmwasm_etl_spark.queries import q_windowed_stats_30m

    ev, batches = _events_batches(spark, sf_dir)
    agg = WindowedStatsAggregates(spark, str(tmp_path / "w30"))
    for b in (3, 0, 2, 1):  # deliberately shuffled ids
        agg.advance_pair30(batches[b], batch_id=b)
    got = {
        (r.window_start, r.event_type): r.n_events for r in agg.pair_stats_30m().collect()
    }
    want = {
        (r.window_start, r.event_type): r.n_events
        for r in q_windowed_stats_30m(spark, sf_dir).collect()
    }
    assert got == want


def test_account_stats_incremental_equals_one_shot(spark, sf_dir, tmp_path):
    """Incremental per-account accumulators == the driver-verified one-shot
    net_position query, across batches and a restart
    (`pkg/db/parser/repository.go:462-533` analog)."""
    from cosmwasm_etl_spark.queries import q_net_position

    ev, batches = _events_batches(spark, sf_dir)
    agg = WindowedStatsAggregates(spark, str(tmp_path / "w30"))
    for b, batch in enumerate(batches[:2]):
        agg.advance_account(batch, batch_id=b)
    # restart: a NEW instance over the same dir continues from stored state
    agg2 = WindowedStatsAggregates(spark, str(tmp_path / "w30"))
    for b, batch in enumerate(batches[2:], start=2):
        agg2.advance_account(batch, batch_id=b)

    got = {
        r.user_id: (r.sum_purchase, r.sum_click, r.net, r.max_side)
        for r in agg2.account_stats().collect()
    }
    want = {
        r.user_id: (r.sum_purchase, r.sum_click, r.net, r.max_side)
        for r in q_net_position(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        for g, w in zip(got[k], want[k]):
            assert abs(g - w) < 1e-4, (k, got[k], want[k])

    # replay of an old batch after restart: no-op
    res = agg2.advance_account(batches[0], batch_id=0)
    assert res["skipped"]


def test_dag_chained_off_pipeline_commits(spark, tmp_path):
    """The aggregator scheduler-DAG analog: downstream incremental tasks
    chained off each CDC commit via post_commit, crash-healed on replay
    (`aggregator/aggregator.go:69-84`)."""
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table
    from cosmwasm_etl_spark.sources.eventlog import synthetic_events

    ev = synthetic_events(spark, 4_000, n_urls=400, events_per_epoch=1_000)
    now_ts = 1_800_000_000
    agg = IncrementalAggregates(spark, str(tmp_path / "agg"), window_hours=9999)

    def to_txs(events_df):
        # ParsedTxWithPrice analog from the raw event slice: key = host,
        # height = epoch, two-sided "volumes" from payload sizes
        return events_df.select(
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("key"),
            F.col("epoch").alias("height"),
            F.unix_timestamp("warc_ts").alias("ts"),
            F.length(F.coalesce(F.col("html"), F.lit(b""))).cast("double").alias("v0"),
            F.lit(1.0).alias("v1"),
        )

    def downstream(events_df, batch_id, stats):
        agg.advance_all(to_txs(events_df), batch_id, now_ts=now_ts)

    table = create_pages_table(spark, str(tmp_path / "pages"), num_buckets=8)
    pipe = CdcPipeline(spark, table, str(tmp_path / "work"), post_commit=downstream)
    pipe.run_replay(ev, epochs_per_batch=1)

    # downstream state == one-shot recompute over the whole log
    got = {
        (r.key, r.height): (round(r.liq0, 6), round(r.liq1, 6))
        for r in agg.lp_history().collect()
    }
    from pyspark.sql import Window

    full = to_txs(ev).groupBy("key", "height").agg(
        F.sum("v0").alias("d0"), F.sum("v1").alias("d1")
    )
    w = Window.partitionBy("key").orderBy("height").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r.key, r.height): (round(r.l0, 6), round(r.l1, 6))
        for r in full.select(
            "key", "height", F.sum("d0").over(w).alias("l0"), F.sum("d1").over(w).alias("l1")
        ).collect()
    }
    assert got == want

    # full replay over the same log: upstream batches skip AND downstream
    # re-advances are no-ops — state unchanged (crash-healing path)
    pipe2 = CdcPipeline(spark, table, str(tmp_path / "work"), post_commit=downstream)
    stats = pipe2.run_replay(ev, epochs_per_batch=1)
    assert all(s.get("skipped") for s in stats)
    got2 = {
        (r.key, r.height): (round(r.liq0, 6), round(r.liq1, 6))
        for r in agg.lp_history().collect()
    }
    assert got2 == want


def test_replay_restart_heals_downstream_crash_after_upstream_commit(spark, tmp_path):
    """A crash BETWEEN an upstream batch commit and its downstream advance
    must be healed when the replay restarts: run_replay's skip branch for
    already-committed batches still fires post_commit (regression for the
    round-2 advice finding — the skip shortcut used to bypass healing)."""
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table
    from cosmwasm_etl_spark.sources.eventlog import synthetic_events

    ev = synthetic_events(spark, 3_000, n_urls=300, events_per_epoch=1_000)
    now_ts = 1_800_000_000
    agg = IncrementalAggregates(spark, str(tmp_path / "agg"), window_hours=9999)

    def to_txs(events_df):
        return events_df.select(
            F.regexp_extract("url", r"https://([^/]+)/", 1).alias("key"),
            F.col("epoch").alias("height"),
            F.unix_timestamp("warc_ts").alias("ts"),
            F.length(F.coalesce(F.col("html"), F.lit(b""))).cast("double").alias("v0"),
            F.lit(1.0).alias("v1"),
        )

    class DownstreamCrash(RuntimeError):
        pass

    crash_on = {1}

    def downstream(events_df, batch_id, stats):
        if batch_id in crash_on:
            crash_on.discard(batch_id)  # crash exactly once
            raise DownstreamCrash(f"simulated crash after commit of batch {batch_id}")
        agg.advance_all(to_txs(events_df), batch_id, now_ts=now_ts)

    table = create_pages_table(spark, str(tmp_path / "pages"), num_buckets=8)
    pipe = CdcPipeline(spark, table, str(tmp_path / "work"), post_commit=downstream)
    import pytest

    with pytest.raises(DownstreamCrash):
        pipe.run_replay(ev, epochs_per_batch=1)
    # batch 1's UPSTREAM commit landed before the downstream crash...
    assert 1 in table.committed_epochs()
    # ...but its downstream advance did not
    assert 1 not in agg.lp.committed_epochs()

    # restart: batches 0 and 1 skip upstream, yet post_commit must still
    # fire so the downstream catches up; batch 2 applies normally
    pipe2 = CdcPipeline(spark, table, str(tmp_path / "work"), post_commit=downstream)
    pipe2.run_replay(ev, epochs_per_batch=1)
    assert 1 in agg.lp.committed_epochs()

    got = {
        (r.key, r.height): (round(r.liq0, 6), round(r.liq1, 6))
        for r in agg.lp_history().collect()
    }
    from pyspark.sql import Window

    full = to_txs(ev).groupBy("key", "height").agg(
        F.sum("v0").alias("d0"), F.sum("v1").alias("d1")
    )
    w = Window.partitionBy("key").orderBy("height").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        (r.key, r.height): (round(r.l0, 6), round(r.l1, 6))
        for r in full.select(
            "key", "height", F.sum("d0").over(w).alias("l0"), F.sum("d1").over(w).alias("l1")
        ).collect()
    }
    assert got == want
