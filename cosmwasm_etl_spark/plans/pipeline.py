"""The CDC apply pipeline — the Spark re-expression of the reference's
parser replay loop (`/root/reference/parser/dex/dex.go:87-267`).

Per micro-batch (= a contiguous range of event epochs; the reference's
per-height loop, batched):

1. **quarantine check** every event (Arrow decode-validity pass) — the
   AmbiguousEventError path (`pkg/eventlog/util.go:58-114`); flagged events
   land in the dead-letter store WITH raw payload ("raw events are never
   lost", `parser/dex/dex.go:186`) and their effects are deferred;
2. **latest-wins dedup** per url over valid events (W5) — map-side-combining
   ``max_by`` aggregate (hot-domain-skew-proof, see operators.dedup_window);
3. **extraction** (html→text pandas UDF) on dedup *winners only* —
   winners ≪ events, so the Python-side work is minimized;
4. **MERGE** into the lakehouse pages table in ONE atomic commit carrying
   the batch id + high-watermark — the analog of the reference's
   single-Postgres-transaction insert + synced-height CAS
   (`parser/dex/repo/repository.go:98-122`);
5. **lineage** row (batch id, seq range, affected buckets, snapshot version,
   counts, duration) — T12 observability, idempotently keyed by batch id.

Exactly-once: batch boundaries are a pure function of configuration
(``epochs_per_batch``), the commit is atomic, and the batch id is recorded in
the commit summary — replaying after any crash skips already-committed
batches and reconverges to the identical table state (tested in
tests/test_replay.py).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cosmwasm_etl_spark.functions.extraction import (
    check_quarantine_udf,
    with_extracted_text,
    with_extracted_text_versioned,
)
from cosmwasm_etl_spark.lakehouse import LakeTable
from cosmwasm_etl_spark.lakehouse.schema import _parse_type as _parse_lake_type
from cosmwasm_etl_spark.operators.dedup_window import latest_wins_agg, latest_wins_window
from cosmwasm_etl_spark.operators.validation import full_outer_diff

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        # engine-internal columns:
        # seq — the event-sequence tiebreaker (SURVEY §7.4.2); with warc_ts it
        # forms the latest-wins order, making MERGE order-insensitive across
        # micro-batches (batches may be delivered out of order by a file
        # source or replayed concurrently);
        # deleted — tombstone flag: deletes are upserts of a tombstone row,
        # never physical removals, so a late-arriving older update can never
        # resurrect a deleted url. Tombstones are vacuumed by retention
        # (S12 analog) once the watermark passes them.
        T.StructField("seq", T.LongType(), True),
        T.StructField("deleted", T.BooleanType(), False),
    ]
)

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]

# reserved ids outside the replay/streaming batch-id space (which is >= 0):
# the deferred dead-letter capture directory, and the namespace offset for
# quarantine-retry commit epochs (so a retry can never collide with — and
# silently skip on — a regular batch epoch).
_DEFERRED_BATCH_ID = -1
_RETRY_EPOCH_BASE = -1000

# UTF-8 encoding of U+FFFD. The literal-replacement-char fast-path check is
# done at the BYTE level (contains on the binary column): for valid UTF-8 it
# is exactly equivalent to searching the decoded string, and it never
# evaluates F.decode on a column that can hold invalid bytes — decode raises
# MALFORMED_CHARACTER_CODING there, and guard&decode conjunctions are only
# safe under an evaluation order Catalyst does not guarantee.
_UFFFD_BYTES = b"\xef\xbf\xbd"


def _is_ok_fast_expr():
    """JVM fast-path validity: empty, or valid UTF-8 without a literal
    U+FFFD. Rows failing this are the masked residue the python byte-level
    arbiter (check_quarantine_udf) re-examines."""
    return (F.length("html") == F.lit(0)) | (
        F.is_valid_utf8(F.col("html")) & ~F.contains(F.col("html"), F.lit(_UFFFD_BYTES))
    )


def _jvm_extract_expr() -> Column:
    """Pure-JVM extraction (the ``extractor="jvm"`` scaling-control path):
    strip script/style/comments/tags with one regexp pass, fold whitespace.
    Cost-representative of the Arrow extractor, zero Python. The decode is
    structurally guarded by when(is_valid_utf8) — not a boolean conjunction
    whose evaluation order Catalyst may rewrite — so invalid bytes yield
    NULL text instead of failing the job (round-4 ADVICE #1). Shared by
    apply_batch and expected_state so apply and audit oracle cannot drift."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(
                F.when(
                    F.is_valid_utf8(F.col("html")),
                    F.decode(F.col("html"), "UTF-8"),
                ),
                r"(?s)<(script|style)\b[^>]*>.*?</\1\s*>|<!--.*?-->|<[^>]*>",
                " ",
            ),
            r"\s+",
            " ",
        )
    )


def create_pages_table(spark: SparkSession, path: str, num_buckets: int = 16) -> LakeTable:
    return LakeTable.create(spark, path, PAGES_SCHEMA, key_col="url", ts_col="warc_ts", num_buckets=num_buckets)


class CdcPipeline:
    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        work_dir: str,
        dedup_strategy: str = "agg",
        salt_buckets: int | None = 16,
        sink_mode: str | None = None,
        compact_every: int = 8,
        extract_versions: list[tuple[int, int]] | None = None,
        quarantine_mode: str = "batch",
        extractor: str = "arrow",
        post_commit=None,
        winner_mode: str = "full",
        canonicalize_keys: bool = False,
    ):
        """``sink_mode``:

        - ``"cow"`` — copy-on-write MERGE per batch (read-optimized: table
          always holds one row per key; batch cost grows with affected-bucket
          size).
        - ``"mor"`` — merge-on-read: batches append delta files (O(batch)
          ingest cost), reads resolve latest-wins, and every
          ``compact_every`` applied batches a compaction folds deltas into
          base. The sustained-ingest configuration for the 10^10 design
          point.
        """
        self.spark = spark
        self.table = table
        self.work_dir = os.path.abspath(work_dir)
        self.quarantine_dir = os.path.join(self.work_dir, "quarantine")
        self.lineage_dir = os.path.join(self.work_dir, "lineage")
        os.makedirs(self.quarantine_dir, exist_ok=True)
        os.makedirs(self.lineage_dir, exist_ok=True)
        self.dedup_strategy = dedup_strategy
        self.salt_buckets = salt_buckets
        # sink_mode=None adopts the TABLE's recorded mode (the commit log
        # remembers whether deltas were ever written) — a second session
        # opening an ingest table gets correct reads without out-of-band
        # coordination. Explicit "cow" over live un-compacted deltas is
        # refused: that read silently returns superseded rows.
        if sink_mode is None:
            sink_mode = table.state().sink_mode or "cow"
        elif sink_mode == "cow":
            st = table.state()
            if st.delta_files:
                raise ValueError(
                    "table has un-compacted delta files (written in mor mode); "
                    "a cow-mode read would return superseded rows — pass "
                    "sink_mode='mor' (or None to adopt the recorded mode)"
                )
        if sink_mode not in ("cow", "mor"):
            raise ValueError(f"unknown sink_mode: {sink_mode}")
        self.sink_mode = sink_mode
        self.compact_every = compact_every
        self._applied_since_compact = 0
        # M5 version dispatch: [(from_epoch, extractor_version), ...]
        self.extract_versions = sorted(extract_versions) if extract_versions else None
        if quarantine_mode not in ("batch", "deferred"):
            raise ValueError(f"unknown quarantine_mode: {quarantine_mode}")
        # "batch": dead-letter rows are spilled within each micro-batch (the
        # reference's per-height behavior). "deferred": run_replay captures
        # them in ONE pass at the end — halves the per-batch scan count; the
        # reference itself only *retries* quarantine on startup/periodically
        # (`parser/dex/dex.go:93-100`), so capture lag is semantically safe:
        # raw events remain in the immutable log either way.
        self.quarantine_mode = quarantine_mode
        # "arrow" (default): the byte-identical pandas-UDF extraction — the
        # CORRECTNESS path. "jvm": a cost-representative pure-JVM extraction
        # (regexp_replace chain) used ONLY as the scaling CONTROL in
        # bench.py — same scans/shuffles/writes with zero Python, so the
        # measured efficiency delta isolates the Python/Arrow layer's
        # scaling contribution. Never use "jvm" for real ingestion: its
        # output is not byte-identical to the reference.
        if extractor not in ("arrow", "jvm"):
            raise ValueError(f"unknown extractor: {extractor}")
        self.extractor = extractor
        # "full" (default): single-phase dedup — ONE scan of the batch, one
        # hash-aggregate exchange of whole rows. Hot-key safe: max_by's
        # map-side partial aggregation collapses every key to one candidate
        # row per map task BEFORE the exchange, so a url with 10^6 updates
        # ships <= n_map_tasks rows, never 10^6. "keys": two-phase — winner
        # selection on ~24 B/event key columns, payloads re-fetched by a
        # bounded broadcast seq-join; the exchange is 333x narrower but the
        # batch is SCANNED TWICE and the broadcast build is an extra job.
        # The round-3 interleaved same-window A/B measured full at 2.15x
        # keys' steady throughput on 8 KB pages (38.9k vs 18.1k ev/s,
        # BENCH.md) — the exchange that "keys" saves is already collapsed
        # by partial aggregation, while its second scan is real extra I/O.
        # Keep "keys" for clusters where shuffle bytes are the binding
        # constraint (e.g. payload >> page-cache, remote shuffle service).
        # "bucket": fused single-exchange variant — repartition once on the
        # table's bucket function, dedup per (bucket, url) with no further
        # exchange (the bucket partitioning already clusters urls), output
        # lands pre-placed for the sink. Trades map-side combine (none —
        # the exchange precedes the agg) for one less full shuffle stage;
        # prefer "full" when per-map-task key duplication is high.
        if winner_mode not in ("keys", "full", "bucket"):
            raise ValueError(f"unknown winner_mode: {winner_mode}")
        self.winner_mode = winner_mode
        # T6 downstream-task barrier (the aggregator scheduler-DAG analog,
        # `aggregator/aggregator.go:69-84`): called AFTER each batch's
        # atomic commit as post_commit(events_df, batch_id, stats). The
        # callee owns its own epoch idempotency (IncrementalAggregates
        # keys every advance on the same batch_id), so a crash between the
        # upstream commit and downstream tasks is healed on replay: the
        # upstream skip still invokes post_commit, the downstream skips
        # what it already applied.
        self.post_commit = post_commit
        # Canonical-key ingestion (webtext): re-crawls of the same page
        # arrive under many spellings (case, default ports, tracking
        # params, fragments, param order); with canonicalize_keys=True the
        # CDC key is the canonical URL, so variants collapse into ONE
        # latest-wins key instead of fragmenting a hot page across several.
        # Normalization is a zero-shuffle projection applied at EVERY raw-
        # event entry point (apply, expected-state/audit, quarantine
        # capture all see the same keys — replay-equivalence still holds);
        # the raw spelling stays recoverable from the immutable event log.
        # Off by default: exact-key mode is the reference's behavior.
        # The scheme is PROVENANCE: stamped into every data commit's
        # summary and folded into TableState.key_norm — reopening a table
        # with the OTHER normalization would silently re-key committed
        # rows (the EVOLUTION_ID_STRIDE hazard class), so it is refused.
        self.canonicalize_keys = bool(canonicalize_keys)
        self._key_norm = "canonical" if self.canonicalize_keys else "exact"
        st = table.state()
        recorded = st.key_norm or ("exact" if st.epochs else "")
        if recorded and recorded != self._key_norm:
            raise ValueError(
                f"table was ingested with key_norm={recorded!r} but this "
                f"pipeline is configured {self._key_norm!r}; flipping "
                f"canonicalize_keys on an existing table would re-key "
                f"committed rows — open it with the recorded mode"
            )

    def _normalize(self, events: DataFrame) -> DataFrame:
        if not self.canonicalize_keys:
            return events
        from cosmwasm_etl_spark.functions.urls import canonicalize_url

        return events.withColumn("url", canonicalize_url(F.col("url")))

    # ------------------------------------------------------------ single batch

    def _dedup(self, df: DataFrame) -> DataFrame:
        if self.dedup_strategy == "agg":
            return latest_wins_agg(df, key="url", order_cols=["warc_ts", "seq"])
        return latest_wins_window(
            df, key="url", order_cols=["warc_ts", "seq"], salt_buckets=self.salt_buckets
        )

    def _winner_seqs(self, valid: DataFrame) -> DataFrame:
        """Latest-wins winner selection on the KEY COLUMNS ONLY.

        The W5 dedup itself needs just (url, warc_ts, seq) — three narrow
        columns — so the aggregate's exchange moves ~24 B/event instead of
        the full 8 KB html payload (333× less shuffle traffic; the payload is
        fetched afterwards by a broadcast seq-join). ``seq`` is globally
        unique, so the surviving seq set identifies winner rows exactly."""
        keys = valid.select("url", "warc_ts", "seq")
        return self._dedup(keys).select("seq")

    def _fetch_winners(self, events: DataFrame, winner_seqs: DataFrame) -> DataFrame:
        """Join the full-width events back to the winner seq set
        (winner_mode="keys" only — always per-micro-batch).

        The seq set is one long column bounded by the micro-batch's distinct
        key count (itself bounded by backpressure/epochs_per_batch), so the
        forced broadcast is safe by construction; the events side is NEVER
        shuffled — its 8 KB payloads stay in their scan partitions until the
        single bucket repartition before the sink write. (The full-log audit
        does NOT come through here: its winner set is corpus-sized, so
        expected_state uses the single-phase dedup instead.)"""
        return events.join(F.broadcast(winner_seqs), "seq")

    def apply_batch(self, events: DataFrame, batch_id: int) -> dict:
        """Apply one micro-batch of change events. Idempotent on batch_id.

        Physical shape: the whole batch streams through ONE job — validity
        check (Arrow decode pass) → latest-wins aggregate → extraction of
        winners → bucketed file write — with batch statistics (event count,
        seq range, quarantine count) collected *during* that job via
        ``Observation`` metrics. No ``persist()`` of raw html (8 KB/page
        payloads through the JVM heap cause GC thrash), no second stats
        pass. The rare quarantine spill re-reads the source slice only when
        the observed quarantine count is non-zero.
        """
        events = self._normalize(events)
        if batch_id in self.table.committed_epochs():
            stats = {"batch_id": batch_id, "skipped": True}
            if self.post_commit is not None:
                # replay healing: downstream tasks may have crashed after
                # this batch's upstream commit — give them their (idempotent)
                # chance again
                self.post_commit(events, batch_id, stats)
            return stats
        t0 = time.time()
        from pyspark.sql import Observation

        # Validity check, JVM-first with a masked python residue: the ratio
        # rule counts U+FFFD in the DECODED string, so it can fire on
        # invalid-UTF-8 payloads (~0.2% of events) AND on valid UTF-8 whose
        # text literally contains '�' — the fast path must exclude both or a
        # literal-U+FFFD page is silently dropped instead of quarantined
        # (round-3 "What's wrong" #2). A byte-level JVM `contains` catches
        # the literal case at column speed (see _UFFFD_BYTES). The UDF input
        # is MASKED to NULL for fast rows, so only the residue's bytes ever
        # cross the Arrow channel (the channel, not python CPU, is the
        # scaling bottleneck), in ONE scan — no two-branch union, no double
        # read. Semantics are identical to running check_quarantine_udf on
        # every row (python rule stays the byte-level arbiter; tested).
        is_ok_fast = _is_ok_fast_expr()
        masked = F.when(~is_ok_fast, F.col("html"))  # NULL for fast rows

        obs = Observation(f"cdc-batch-{batch_id}")
        if self.extractor == "jvm":
            # control path: JVM-only validity (is_valid_utf8 — a strict
            # superset of the python ratio rule on the fixtures). The
            # dead-letter label distinguishes the two ways the fast check
            # fires — truly invalid bytes vs a valid page containing a
            # literal U+FFFD (r5 ADVICE #2); the capture SET is unchanged.
            q_err = F.when(
                ~is_ok_fast,
                F.when(
                    F.is_valid_utf8(F.col("html")), F.lit("replacement_char_literal")
                ).otherwise(F.lit("invalid_encoding")),
            )
        else:
            # r6 A/B note: a residue-branch form (python arbiter on a
            # second events.filter(~is_ok_fast) scan, joined back as a
            # broadcast bad-list) was measured SLOWER (3.3 s vs 2.6 s per
            # 250k-event plan): the duplicated utf8-validity scan over the
            # full batch costs more than this masked column's mostly-NULL
            # Arrow channel. The masked single-scan form stands.
            q_err = check_quarantine_udf()(masked)
        ev = events.withColumn("__q_err", q_err).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.max("seq").alias("max_seq"),
            F.min("seq").alias("min_seq"),
            F.count("__q_err").alias("nq"),
        )
        valid = ev.filter(F.col("__q_err").isNull()).drop("__q_err")
        n_buckets = self.table.state().num_buckets
        # Winner selection + bucket placement (see winner_mode in __init__):
        # - "bucket": FUSED — one repartition on the table's bucket
        #   function, then a per-(bucket, url) max_by agg. The repartition's
        #   HashPartitioning(__b) already satisfies the aggregate's
        #   ClusteredDistribution(__b, url) (same url ⇒ same bucket ⇒ same
        #   partition), so the agg adds NO second exchange and its output is
        #   already bucket-placed for the sink: the whole apply path has
        #   exactly ONE exchange.
        # - "full": dedup exchange on url (map-side combined), then a
        #   second exchange placing winners by bucket.
        # - "keys": key-only dedup + broadcast payload re-fetch, then the
        #   bucket exchange.
        # Extraction always runs AFTER placement, so shuffled bytes are raw
        # html, never html+text.
        if self.winner_mode == "bucket":
            bexpr = self.table._bucket_expr("url", n_buckets)
            cols = valid.columns
            row = F.struct(*[F.col(c) for c in cols])
            order = F.struct(F.col("warc_ts"), F.col("seq"))
            placed = (
                valid.withColumn("__b", bexpr)
                .repartition(max(n_buckets, 1), F.col("__b"))
                .groupBy("__b", "url")
                .agg(F.max_by(row, order).alias("__r"))
                .select(*[F.col(f"__r.{c}").alias(c) for c in cols])
            )
        else:
            if self.winner_mode == "full":
                winners = self._dedup(valid)
            else:
                winner_seqs = self._winner_seqs(valid)
                winners = self._fetch_winners(events, winner_seqs)
            placed = winners.withColumn(
                "__b", self.table._bucket_expr("url", n_buckets)
            ).repartition(max(n_buckets, 1), F.col("__b")).drop("__b")
        if self.extract_versions:
            extracted = with_extracted_text_versioned(
                placed, self.extract_versions, epoch_col="epoch", html_col="html", out_text="text"
            )
        elif self.extractor == "jvm":
            extracted = placed.withColumn("text", _jvm_extract_expr()).withColumn(
                "__extract_err", F.lit(None).cast("string")
            )
        else:
            extracted = with_extracted_text(placed, html_col="html", out_text="text")
        # the cheap pre-check and the full extraction share one validity
        # rule (tested byte-identical) — extraction runs exactly once, on
        # dedup winners only; the filter below is defensive.
        ok = extracted.filter(F.col("__extract_err").isNull()).withColumn(
            "deleted", F.col("op") == "delete"
        )
        # dynamic projection to the CURRENT table schema: evolved columns
        # come from the event payload when present; a RENAMED column whose
        # payload still uses the old name follows the field-id lineage
        # through the historical schema versions (event producers keep
        # emitting the pre-rename name — dropping those values would lose
        # data whenever a pre-rename event is applied post-rename, e.g.
        # out-of-order streaming delivery); NULL only when no name of the
        # field id ever appears (the read-side half lives in
        # lakehouse.schema.align_to)
        tbl_state = self.table.state()
        cur = tbl_state.schema
        cols = []
        for f in cur.fields:
            src = f.name if f.name in ok.columns else None
            if src is None:
                for sv in sorted(tbl_state.schemas, reverse=True):
                    old = next(
                        (g.name for g in tbl_state.schemas[sv].fields if g.id == f.id),
                        None,
                    )
                    if old is not None and old in ok.columns:
                        src = old
                        break
            spark_t = _parse_lake_type(f.type)
            if src is not None:
                cols.append(F.col(src).cast(spark_t).alias(f.name))
            else:
                cols.append(F.lit(None).cast(spark_t).alias(f.name))
        batch = ok.select(*cols)

        def _merged_obs() -> dict:
            try:
                got = obs.get
            except Exception:
                # An ALL-EMPTY micro-batch (a gap in the epoch sequence) can
                # collapse to a plan whose CollectMetrics node never runs
                # (AQE empty-relation propagation), leaving the observation
                # unfilled — Observation.get then raises a JVM assertion.
                # Confirm the batch really was empty before degrading to
                # zero counts; anything else must surface.
                if not ev.isEmpty():
                    raise
                return {"n": 0, "max_seq": None, "min_seq": None, "nq": 0}
            return {
                "n": int(got["n"] or 0),
                "max_seq": got["max_seq"],
                "min_seq": got["min_seq"],
                "nq": int(got["nq"] or 0),
            }

        def _observed_summary() -> dict:
            # runs after the sink's write job (metrics available), before
            # the atomic commit — watermark + counts land IN the commit,
            # exactly like the reference's single-transaction CAS.
            got = _merged_obs()
            return {
                "watermark": got["max_seq"],
                "n_events": got["n"],
                "n_quarantined": got["nq"],
                "min_seq": got["min_seq"],
            }

        if self.sink_mode == "mor":
            res = self.table.append_delta(
                batch, epoch=batch_id, summary_fn=_observed_summary, pre_partitioned=True,
                extra_summary={"key_norm": self._key_norm},
            )
        else:
            res = self.table.merge_upserts(
                batch,
                epoch=batch_id,
                op_col=None,  # tombstone pattern: deletes are flagged upserts
                order_cols=["warc_ts", "seq"],
                summary_fn=_observed_summary,
                extra_summary={"key_norm": self._key_norm},
            )

        got = _merged_obs()
        n_events, max_seq = got["n"], got["max_seq"]
        n_quarantined = int(got["nq"] or 0)

        if n_quarantined and self.quarantine_mode == "batch":
            self._capture_quarantine(events, batch_id)

        if self.sink_mode == "mor":
            self._applied_since_compact += 1
            if self._applied_since_compact >= self.compact_every:
                self.table.compact(self._resolve_latest)
                self._applied_since_compact = 0

        stats = {
            "batch_id": batch_id,
            "skipped": bool(res.get("skipped")),
            "n_events": int(n_events or 0),
            "n_quarantined": int(n_quarantined),
            "min_seq": int(got["min_seq"]) if got["min_seq"] is not None else None,
            "max_seq": int(max_seq) if max_seq is not None else None,
            "table_version": res.get("version"),
            "rows_after": res.get("rows_after"),
            "duration_ms": int((time.time() - t0) * 1000),
        }
        self._write_lineage(stats)
        if self.post_commit is not None:
            self.post_commit(events, batch_id, stats)
        return stats

    def _capture_quarantine(self, events: DataFrame, batch_id: int) -> int:
        """Recompute only the dead-letter slice: a JVM-side prefilter (strict
        superset of the python ratio rule — invalid UTF-8 OR a literal '�' in
        the decoded text, since the ratio rule counts U+FFFD in the DECODED
        string) prunes ~99.8% of rows before any byte crosses to Python."""
        candidates = events.filter((F.length("html") > 0) & ~_is_ok_fast_expr())
        if self.extractor == "jvm":
            # the capture arbiter must be the SAME rule apply_batch used to
            # exclude the rows — in jvm mode that is the fast path itself.
            # Re-arbitrating with the python ratio rule here would silently
            # drop rows the two rules disagree on (e.g. a short page with
            # two invalid bytes: invalid UTF-8, but replacement ratio < 0.3).
            q = candidates.withColumn(
                "__q_err",
                F.when(
                    F.is_valid_utf8(F.col("html")), F.lit("replacement_char_literal")
                ).otherwise(F.lit("invalid_encoding")),
            )
        else:
            q = candidates.withColumn(
                "__q_err", check_quarantine_udf()(F.col("html"))
            ).filter(F.col("__q_err").isNotNull())
        return self._write_quarantine(q, batch_id)

    def _write_quarantine(self, df: DataFrame, batch_id: int, suffix: str = "") -> int:
        """Dead-letter store (T8): raw payload preserved; per-batch directory
        overwrite makes replays idempotent (analog of the atomic quarantine
        upsert, `parser/dex/repo/repository.go:302-330`)."""
        out = df.select(
            "seq", "epoch", "op", "url", "warc_ts", "html", "lang",
            F.col("__q_err").alias("err"), F.lit(batch_id).alias("batch_id"),
        )
        path = os.path.join(self.quarantine_dir, f"batch={batch_id}{suffix}")
        out.write.mode("overwrite").parquet(path)
        import pyarrow.parquet as pq
        import glob

        return sum(
            pq.ParquetFile(p).metadata.num_rows for p in glob.glob(os.path.join(path, "*.parquet"))
        )

    def _write_lineage(self, stats: dict) -> None:
        """T12/north-rule lineage: one JSON doc per batch (idempotent by batch
        id), carrying offsets (seq range), commit snapshot version, counts,
        and timing. Affected buckets live in the commit summary itself."""
        path = os.path.join(self.lineage_dir, f"batch-{stats['batch_id']}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({**stats, "wall_ts": time.time()}, f)
        os.replace(tmp, path)

    def lineage(self) -> list[dict]:
        out = []
        for name in sorted(os.listdir(self.lineage_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.lineage_dir, name)) as f:
                    out.append(json.load(f))
        return sorted(out, key=lambda d: d["batch_id"])

    # ------------------------------------------------------------ batch replay

    def _ensure_evolutions(self, upto_epoch: int, evolutions: list[tuple[int, str, dict]]) -> None:
        """Apply pending schema evolutions whose boundary epoch ≤ upto_epoch.

        Idempotent by inspection (a restarted replay re-walks the list but
        skips already-applied steps), so evolution lands at the SAME epoch
        boundary on every replay — SURVEY §7.4.5 / the reference's
        migration-at-version semantics."""
        st = self.table.state()
        names = st.schema.names()
        types = {f.name: f.type for f in st.schema.fields}
        for at_epoch, change, spec in sorted(evolutions):
            if at_epoch > upto_epoch:
                break
            applied = (
                (change == "add_column" and spec["name"] in names)
                or (change == "rename_column" and spec["new"] in names)
                or (change == "widen_type" and types.get(spec["name"]) == spec["to"])
            )
            if not applied:
                self.table.evolve_schema(change, spec)
                st = self.table.state()
                names = st.schema.names()
                types = {f.name: f.type for f in st.schema.fields}

    def run_replay(
        self,
        events: DataFrame,
        epochs_per_batch: int = 10,
        schema_evolutions: list[tuple[int, str, dict]] | None = None,
    ) -> list[dict]:
        """Replay the whole event log in deterministic micro-batches.

        Batch boundaries: ``batch_id = epoch // epochs_per_batch`` — a pure
        function of config, so a restarted replay forms the SAME batches and
        the epoch-idempotency check skips completed ones (T2 exactly-once).

        ``schema_evolutions``: [(at_epoch, change, spec), ...] applied at the
        same epoch boundary on every (re)play (FIXTURES.md §4).
        """
        bounds = events.agg(F.min("epoch"), F.max("epoch")).collect()[0]
        if bounds[0] is None:
            return []
        first_b, last_b = int(bounds[0]) // epochs_per_batch, int(bounds[1]) // epochs_per_batch
        done = self.table.committed_epochs()
        # Deferred dead-letter capture overlaps the batch applies (guide
        # §2.6: independent jobs back-fill each other's idle tails): the
        # pass re-scans the whole log — measured 9 s of a 46 s 1M-event
        # replay when run serially after the last batch — and reads/writes
        # nothing the applies touch, so its wall time hides behind the
        # batches' AQE barriers and write tails. Joined (and its errors
        # re-raised) before this method returns, so callers still observe
        # completed capture.
        q_thread = None
        q_err: list[BaseException] = []
        if self.quarantine_mode == "deferred":
            import threading

            def _capture() -> None:
                try:
                    self._capture_quarantine(events, _DEFERRED_BATCH_ID)
                except BaseException as e:  # noqa: BLE001 — re-raised on join
                    q_err.append(e)

            q_thread = threading.Thread(target=_capture, daemon=True)
            q_thread.start()
        all_stats = []
        for b in range(first_b, last_b + 1):
            lo, hi = b * epochs_per_batch, (b + 1) * epochs_per_batch
            if schema_evolutions:
                self._ensure_evolutions(lo, schema_evolutions)
            chunk = events.filter((F.col("epoch") >= lo) & (F.col("epoch") < hi))
            if b in done:
                # already committed upstream — but a crash may have hit
                # BETWEEN that commit and the downstream post_commit tasks,
                # so the healing chance must fire here too (the downstream
                # advances are idempotent on the batch id and skip cheaply)
                stats = {"batch_id": b, "skipped": True}
                if self.post_commit is not None:
                    self.post_commit(chunk, b, stats)
                all_stats.append(stats)
                continue
            all_stats.append(self.apply_batch(chunk, b))
        if q_thread is not None:
            # single amortized dead-letter pass over the WHOLE log, written
            # to one fixed directory — unconditional (a crash-restarted
            # replay reports skipped batches with no n_quarantined, so
            # gating on stats would silently drop the capture) and
            # idempotent across re-replays over a grown log (same dir is
            # overwritten; no per-last-batch duplicate directories).
            # Started before the first batch; completed here.
            q_thread.join()
            if q_err:
                raise q_err[0]
        return all_stats

    # ------------------------------------------------------------ reads

    def _resolve_latest(self, df: DataFrame) -> DataFrame:
        """Latest-wins reducer over base+delta rows (MOR read resolution)."""
        return latest_wins_agg(df, key="url", order_cols=["warc_ts", "seq"])

    def pages(self) -> DataFrame:
        """Active (non-tombstoned) pages: canonical input_hint columns plus
        ``seq`` and any schema-evolved columns.

        In COW mode the table already holds one row per key; in MOR mode the
        read resolves latest-wins across un-compacted deltas first."""
        df = self.table.read()
        if self.sink_mode == "mor":
            df = self._resolve_latest(df)
        out_cols = [c for c in df.columns if c != "deleted"]
        return df.filter(~F.col("deleted")).select(*out_cols)

    # alias kept for clarity in evolution tests
    pages_evolved = pages

    def pages_for(
        self,
        urls: DataFrame,
        buckets: list[int] | None = None,
        include_deleted: bool = False,
    ) -> DataFrame:
        """Live pages for a bounded url set — the keyed-subset read.

        Two scale properties :meth:`pages` cannot give a point lookup:
        only the buckets containing the requested urls are read
        (file-level skipping via the commit log's bucket metadata), and
        the MOR latest-wins resolution runs AFTER the key filter, over the
        matched rows only — never over the corpus. The bucket set is one
        tiny driver-side collect (≤ num_buckets ints), the same bookkeeping
        MERGE derives from its staged batch — or zero jobs when the caller
        already knows it (``buckets=``, e.g. from a batch commit's file
        metadata). ``include_deleted=True`` keeps resolved tombstone rows
        (with their ``deleted`` flag) instead of filtering to live pages —
        the shape derived-state resyncs need to distinguish "deleted" from
        "never existed" without a second anti-join pass."""
        st = self.table.state()
        if buckets is None:
            buckets = [
                r["b"]
                for r in urls.select(
                    self.table._bucket_expr("url", st.num_buckets).alias("b")
                ).distinct().collect()
            ]
        df = self.table.read_buckets(buckets).join(F.broadcast(urls.select("url")), "url")
        df = self._resolve_latest(df)
        if include_deleted:
            return df
        out_cols = [c for c in df.columns if c != "deleted"]
        return df.filter(~F.col("deleted")).select(*out_cols)

    def vacuum_tombstones(self, older_than_ts: str, epoch: int | None = None) -> dict:
        """Retention pass (S12 analog): physically drop tombstones older than
        the given timestamp — safe once no replay can deliver events older
        than it. ``ts_upper`` lets the table prune non-overlapping files
        from footer stats before any scan."""
        return self.table.delete_where(
            f"deleted AND warc_ts < timestamp'{older_than_ts}'",
            epoch=epoch,
            ts_upper=older_than_ts,
        )

    # ------------------------------------------------------------ audit (T9)

    def expected_state(self, events: DataFrame) -> DataFrame:
        """The replay oracle: latest non-deleted version per url, extracted.
        (A6/T9 analog — `parser/dex/repo/repository.go:136-168`.)

        Same logical shape as apply: masked single-scan validity check
        (valid-utf8 rows never cross the Arrow channel), then the
        single-phase latest-wins dedup — ONE scan of the log, map-side
        combine before the exchange. (The two-phase key-only + payload
        re-fetch shape was measured 2x slower in the round-3 A/B AND its
        winner set — one row per distinct url in the corpus — is unbounded
        here, so there is no broadcast to exploit; see BENCH.md.)"""
        events = self._normalize(events)
        is_ok_fast = _is_ok_fast_expr()
        if self.extractor == "jvm":
            # oracle mirrors the jvm apply path exactly: fast-path validity
            # is the arbiter, extraction is the shared JVM expression.
            # NULL-html rows: apply's `when(~is_ok_fast, ...)` yields a NULL
            # error (row KEPT), but a bare filter(is_ok_fast) evaluates to
            # NULL and would DROP the row — coalesce mirrors apply's null
            # semantics so a NULL-html event cannot read as divergence
            # (r5 ADVICE #1).
            valid = events.filter(F.coalesce(is_ok_fast, F.lit(True)))
            winners = self._dedup(valid)
            alive = winners.filter(F.col("op") != "delete")
            return alive.withColumn("text", _jvm_extract_expr()).select(
                "url", "warc_ts", "html", "text", "lang"
            )
        masked = F.when(~is_ok_fast, F.col("html"))
        valid = events.withColumn("__q_err", check_quarantine_udf()(masked)).filter(
            F.col("__q_err").isNull()
        ).drop("__q_err")
        winners = self._dedup(valid)
        alive = winners.filter(F.col("op") != "delete")
        return with_extracted_text(alive).filter(F.col("__extract_err").isNull()).select(
            "url", "warc_ts", "html", "text", "lang"
        )

    def audit(self, events: DataFrame) -> DataFrame:
        """Replay-equivalence audit: full recompute vs current table state;
        empty result ⇔ equivalent (the T9 validation-worker analog)."""
        return full_outer_diff(
            self.expected_state(events),
            self.pages(),
            keys=["url"],
            compare_cols=["warc_ts", "text", "lang"],
        )

    def audit_log_prefix(self, events: DataFrame) -> DataFrame | None:
        """Audit against only the APPLIED slice of the log — the
        steady-state T9 cadence check: the log directory may already hold
        events the stream has not delivered yet, and those must not read as
        divergence (`parser/dex/dex.go:381-518` runs its validation off a
        cursor the same way).

        The file source can deliver files out of seq order during catch-up,
        so the applied set may have HOLES the per-batch [min_seq, max_seq]
        lineage cannot see (a batch's own files may be non-adjacent ranges);
        gap detection is therefore exact-by-counting: the audit only runs
        when the number of applied events equals the log's event count over
        [min applied seq, max applied seq] — one pushdown-friendly count.
        Returns None when holes exist (the caller reports a skipped audit)."""
        lin = [
            s for s in self.lineage()
            if not s.get("skipped") and s.get("min_seq") is not None
        ]
        if not lin:
            return None
        lo = min(int(s["min_seq"]) for s in lin)
        hi = max(int(s["max_seq"]) for s in lin)
        applied_n = sum(int(s["n_events"] or 0) for s in lin)
        span = events.filter((F.col("seq") >= lo) & (F.col("seq") <= hi))
        if span.count() != applied_n:
            return None
        return self.audit(span)

    def maintenance(
        self,
        tombstone_horizon_sec: int | None = None,
        vacuum_retain_versions: int | None = None,
    ) -> dict:
        """Self-maintenance pass for long-running streams: physically drop
        tombstones older than (table max warc_ts − horizon) — the cutoff
        comes from file-footer ts stats, zero data read — then vacuum
        de-referenced parquet. Both steps are idempotent and bounded, so a
        cadence can call this after any batch."""
        import datetime as _dt

        out: dict = {}
        if tombstone_horizon_sec is not None:
            st = self.table.state()
            max_ts = max(
                (e["max_ts"] for e in st.files.values() if e.get("max_ts") is not None),
                default=None,
            )
            if max_ts is not None:
                cutoff = _dt.datetime.fromtimestamp(
                    max_ts / 1e6, _dt.timezone.utc
                ) - _dt.timedelta(seconds=tombstone_horizon_sec)
                out["tombstones"] = self.vacuum_tombstones(
                    cutoff.strftime("%Y-%m-%d %H:%M:%S")
                )
        if vacuum_retain_versions is not None:
            out["vacuum"] = self.table.vacuum(retain_versions=vacuum_retain_versions)
        return out

    # ------------------------------------------------------------ dead letter

    def read_quarantine(self) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            df = self.spark.read.parquet(os.path.join(self.quarantine_dir, "batch=*"))
            # one row per quarantined event: a crash between a retry pass's
            # compaction write and its old-dir cleanup briefly leaves two
            # copies of each still-failing row (identical except possibly a
            # refreshed err from the newer pass); collapse on the unique
            # event id so duplicates never survive into reads, counts, or
            # the next compaction
            return df.dropDuplicates(["seq"])
        except AnalysisException as e:
            cond = (e.getCondition() or "") if hasattr(e, "getCondition") else ""
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise  # corrupt store must surface, not read as empty
            return self.spark.createDataFrame(
                [], "seq long, epoch long, op string, url string, warc_ts timestamp, "
                "html binary, lang string, err string, batch_id long"
            )

    def retry_quarantine(self, batch_id: int, extractor=None) -> dict:
        """Re-attempt quarantined events (T8 retry,
        `parser/dex/dex.go:282-320`): rows whose extraction now succeeds are
        merged (latest-wins condition in MERGE protects newer table rows)
        AND leave the quarantine store; still-failing rows stay, with their
        error refreshed. Pass a custom ``extractor`` (df→df with
        text/__extract_err) to model a fixed parser version.

        Resolution lifecycle (r4 "What's wrong" #1): after the merge the
        store is compacted to exactly the still-failing rows, so repeated
        retry passes never re-extract resolved rows and the store cannot
        grow without bound. The extractor runs exactly ONCE per pass — its
        output is staged to parquet, and both the merge and the compaction
        read the staging, not the extractor plan. Crash-safety: the merge
        commit is the atomic point; a crash before compaction leaves
        resolved rows in the store, and the NEXT retry pass converges —
        its merge (a later retry epoch) re-applies idempotently under the
        latest-wins guard and its compaction clears them.
        (Reference analog: the atomic quarantine upsert+delete,
        `parser/dex/repo/repository.go:302-330`.)"""
        import glob as _glob
        import shutil as _shutil

        q = self.read_quarantine()
        if q.isEmpty():
            return {"retried": 0, "resolved": 0}
        from pyspark.sql import Observation

        extractor = extractor or (lambda df: with_extracted_text(df))
        # retried/resolved counts ride the staging write job as Observation
        # metrics — extraction executes exactly ONCE per pass
        obs = Observation(f"retry-{batch_id}")
        ex = extractor(q).observe(
            obs,
            F.count(F.lit(1)).alias("retried"),
            F.count(F.when(F.col("__extract_err").isNull(), 1)).alias("resolved"),
        )
        staging = os.path.join(self.work_dir, "quarantine_retry_staging")
        ex.write.mode("overwrite").parquet(staging)
        staged = self.spark.read.parquet(staging)

        ok = staged.filter(F.col("__extract_err").isNull())
        winners = latest_wins_agg(ok, key="url", order_cols=["warc_ts", "seq"])
        batch = winners.select(
            "url", "warc_ts", "html", "text", "lang", "seq",
            (F.col("op") == "delete").alias("deleted"),
        )
        # retry epochs live in their own id namespace (below _RETRY_EPOCH_BASE)
        # so they can never collide with a replay/streaming batch epoch; a
        # genuinely replayed retry is still skipped idempotently, but that is
        # surfaced to the caller instead of silently reporting success.
        retry_epoch = _RETRY_EPOCH_BASE - int(batch_id)
        res = self.table.merge_upserts(
            batch, epoch=retry_epoch, op_col=None, order_cols=["warc_ts", "seq"],
            extra_summary={"key_norm": self._key_norm},
        )
        # compaction runs on the skipped (already-committed) path too — that
        # is exactly the crash-heal case where the previous pass committed
        # its merge but died before clearing resolved rows
        still = staged.filter(F.col("__extract_err").isNotNull()).select(
            "seq", "epoch", "op", "url", "warc_ts", "html", "lang",
            F.col("__extract_err").alias("err"), "batch_id",
        )
        keep_dir = os.path.join(self.quarantine_dir, f"batch=retry_{int(batch_id)}")
        old_dirs = [
            d for d in _glob.glob(os.path.join(self.quarantine_dir, "batch=*"))
            if os.path.abspath(d) != os.path.abspath(keep_dir)
        ]
        # write-new-then-delete-old: re-runnable at any crash point
        still.write.mode("overwrite").parquet(keep_dir)
        for d in old_dirs:
            _shutil.rmtree(d, ignore_errors=True)
        _shutil.rmtree(staging, ignore_errors=True)
        got = obs.get
        out = {
            "retried": int(got["retried"] or 0),
            "resolved": int(got["resolved"] or 0),
            "merge": res,
        }
        if res.get("skipped"):
            out["skipped"] = True
        return out
