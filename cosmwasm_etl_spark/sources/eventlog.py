"""Ordered change-event log: schema, deterministic generator, readers.

The event log is the engine's input per BASELINE.json ``input_hint`` — the
analog of the reference's block-height-ordered raw-tx stream (the collector's
per-height blobs, `/root/reference/collector/repo/repository.go:88-139`, read
back by the parser replay loop `/root/reference/parser/dex/dex.go:141-247`):

    events(seq long, epoch long, op string, url string, warc_ts timestamp,
           html binary, lang string)

- ``seq``: global monotone sequence = total order (height + tx index analog;
  the explicit latest-wins tiebreaker, SURVEY §7.4.2).
- ``epoch``: micro-batch id (height analog); many seqs per epoch.

The synthetic generator is 100% native Column expressions (spark.range +
hash functions — no Python in the data path, no driver-side loops), seeded
and fully deterministic, with the skew/tie/delete/quarantine cases FIXTURES.md
§1 requires:

- hot-domain skew: ~20% of events hit the ~1% "hot" urls,
- multiple updates per url; deletes followed by re-inserts,
- same-``warc_ts`` ties broken by ``seq``,
- a deterministic sprinkle of undecodable html (quarantine fixture §5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
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

_LANGS = ["en", "de", "fr", "zh", "es", "ja", "ru", "pt"]
_BASE_EPOCH_SECONDS = 1_767_225_600  # 2026-01-01T00:00:00Z


def _h(col, seed: int, salt: int):
    """Deterministic 64-bit hash of (seed, salt, col) as a Column."""
    return F.xxhash64(F.lit(seed), F.lit(salt), col)


def synthetic_events(
    spark: SparkSession,
    n_events: int,
    n_urls: int = 10_000,
    events_per_epoch: int = 10_000,
    seed: int = 42,
    hot_url_fraction: float = 0.01,
    hot_traffic_fraction: float = 0.20,
    delete_pct: int = 8,
    quarantine_per_mille: int = 2,
    n_hosts: int | None = None,
    body_words: int = 12,
) -> DataFrame:
    """Deterministic skewed CDC event stream (all-JVM generation).

    ``body_words`` sizes the html payload (≈7 bytes/word): tests use the
    small default; benchmarks use O(1000) words ≈ 8 KB/page to match real
    Common-Crawl page sizes, so extraction/decode dominate like they would
    in production."""
    n_hot = max(1, int(n_urls * hot_url_fraction))
    n_cold = max(1, n_urls - n_hot)
    n_hosts = n_hosts or max(1, n_urls // 20)
    hot_cut = int(hot_traffic_fraction * 1000)

    df = spark.range(0, n_events).withColumnRenamed("id", "seq")
    seq = F.col("seq")

    is_hot = F.pmod(_h(seq, seed, 1), F.lit(1000)) < hot_cut
    url_id = F.when(is_hot, F.pmod(_h(seq, seed, 2), F.lit(n_hot))).otherwise(
        F.lit(n_hot) + F.pmod(_h(seq, seed, 3), F.lit(n_cold))
    )
    host_id = F.pmod(url_id, F.lit(n_hosts))
    url = F.concat(
        F.lit("https://host"), host_id.cast("string"), F.lit(".example.com/p/"), url_id.cast("string")
    )

    op_r = F.pmod(_h(seq, seed, 4), F.lit(100))
    op = (
        F.when(op_r < delete_pct, F.lit("delete"))
        .when(op_r < 50 + delete_pct, F.lit("update"))
        .otherwise(F.lit("insert"))
    )

    # non-decreasing in seq (so per-url non-decreasing); consecutive seq pairs
    # share a timestamp -> same-warc_ts ties resolved by seq (SURVEY §7.4.2)
    ts_sec = F.lit(_BASE_EPOCH_SECONDS) + (seq - F.pmod(seq, F.lit(2)))
    warc_ts = F.timestamp_seconds(ts_sec)

    lang = F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]), (F.pmod(_h(url_id, seed, 5), F.lit(len(_LANGS))) + 1).cast("int")
    )

    word = F.concat(F.lit("w"), F.pmod(_h(seq, seed, 6), F.lit(99991)).cast("string"))
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(body_words)),
            lambda i: F.concat(F.lit("t"), F.pmod(F.xxhash64(F.lit(seed), seq, i), F.lit(99991)).cast("string")),
        ),
    )
    good_html = F.concat(
        F.lit("<html><head><title>Page "),
        url_id.cast("string"),
        F.lit('</title><style>body{color:red}</style></head><body><h1>Host '),
        host_id.cast("string"),
        F.lit("</h1><!-- rev --><p>rev "),
        seq.cast("string"),
        F.lit(" &amp; token "),
        word,
        F.lit(" &lt;ok&gt;</p><p>"),
        body,
        F.lit("</p><script>var x=1;</script></body></html>"),
    )
    bad = F.unhex(F.lit("FF" * 48))  # 48 invalid-utf8 bytes -> quarantined
    is_bad = F.pmod(_h(seq, seed, 7), F.lit(1000)) < quarantine_per_mille
    html = (
        F.when(op == "delete", F.lit(b""))
        .when(is_bad, bad)
        .otherwise(F.encode(good_html, "UTF-8"))
    )

    return df.select(
        seq.alias("seq"),
        (seq / F.lit(events_per_epoch)).cast("long").alias("epoch"),
        op.alias("op"),
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        lang.alias("lang"),
    )


def write_event_log(df: DataFrame, path: str, range_partitions: int = 32) -> None:
    """Materialize an event log: range-partitioned by seq so epoch/seq
    predicates prune via parquet row-group min/max stats (epoch is monotone
    in seq). At the 10^10 design point this is the collector's S3 layout
    analog (`collector/datastore/datastore.go:344-376`)."""
    df.repartitionByRange(range_partitions, "seq").write.mode("overwrite").parquet(path)


def read_event_log(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(EVENT_SCHEMA).parquet(path)


def read_event_log_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    include_evolved_columns: bool = False,
) -> DataFrame:
    """Structured Streaming tail of the event-log directory (S1 analog —
    `readStream` + AvailableNow replaces the gRPC poll loop
    `collector/collector.go:48-95`).

    ``include_evolved_columns`` widens the pinned canonical schema with any
    extra payload columns present in the log files at query start (the file
    source fixes its schema per query) — required when schema evolutions are
    in play, or the evolved columns would be silently dropped at scan. A
    column that first appears in files written AFTER the query started is
    picked up at the next (re)start from checkpoint — exactly the
    restart-and-migrate contract of the reference's collector."""
    schema = EVENT_SCHEMA
    if include_evolved_columns:
        canonical = {f.name for f in EVENT_SCHEMA.fields}
        from pyspark.errors import AnalysisException

        try:
            actual = spark.read.option("mergeSchema", "true").parquet(path).schema
            extras = [f for f in actual.fields if f.name not in canonical]
        except AnalysisException as e:
            # ONLY the missing/empty-dir analysis errors mean "canonical
            # schema, no evolved columns yet". Any other failure (corrupt
            # file, transient IO) must propagate — swallowing it would
            # silently drop evolved columns and downstream apply would fill
            # them with NULLs with no signal (r4 advice).
            cond = (e.getCondition() or "") if hasattr(e, "getCondition") else ""
            if cond not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
                raise
            extras = []
        schema = T.StructType(EVENT_SCHEMA.fields + extras)
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


# --------------------------------------------------------------------- jsonl

# Wire schema for JSONL logs: html travels base64-encoded (JSON has no
# binary type); every field nullable so PERMISSIVE parsing can null out
# the fields of a malformed line while filling _corrupt_record.
_JSONL_WIRE_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), True),
        T.StructField("epoch", T.LongType(), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("_corrupt_record", T.StringType(), True),
    ]
)

_JSONL_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
_REQUIRED_EVENT_FIELDS = ("seq", "epoch", "op", "url", "warc_ts")


def write_event_log_jsonl(df: DataFrame, path: str, range_partitions: int = 32) -> None:
    """JSONL twin of :func:`write_event_log` (external CDC-dump exchange
    format): html base64-encoded, timestamps written with an explicit
    microsecond+offset format so the reader round-trips exactly. Same
    seq-range partitioning; JSON carries no footer stats, so epoch pruning
    comes from file-level ordering only — parquet remains the performance
    format, JSONL the interchange one."""
    (
        df.withColumn("html", F.base64(F.col("html")))
        .repartitionByRange(range_partitions, "seq")
        .write.mode("overwrite")
        .option("timestampFormat", _JSONL_TS_FMT)
        .json(path)
    )


def read_event_log_jsonl(
    spark: SparkSession, path: str, on_malformed: str = "fail"
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Read a JSONL change-event log into the canonical EVENT_SCHEMA.

    ``on_malformed``:

    - ``"fail"`` (default) — FAILFAST: any unparsable line or line missing
      a required field (seq/epoch/op/url/warc_ts) raises; the strict-inputs
      contract of a replay source. (Costs one extra validation pass over
      the log, early-exiting at the first bad line — use ``"quarantine"``
      for the single-scan production path.)
    - ``"quarantine"`` — returns ``(events, bad)``: PERMISSIVE parse where
      ``bad`` carries one ``raw_line`` string per rejected input line (the
      dead-letter convention of the pipeline's quarantine store,
      `plans/pipeline.py` T8) and ``events`` is clean EVENT_SCHEMA rows.
      A line is rejected if it fails to parse OR parses with a required
      field absent/null — both would otherwise corrupt replay ordering.

    Reference analog: the FCD/LCD JSON payload readers
    (`collector/fcd/fcd.go`), re-expressed as a schema-pinned JSON scan
    with dead-lettering instead of per-row Go decoding.
    """
    if on_malformed not in ("fail", "quarantine"):
        raise ValueError(f"on_malformed must be 'fail' or 'quarantine', got {on_malformed!r}")
    required_null = None
    for c in _REQUIRED_EVENT_FIELDS:
        cond = F.col(c).isNull()
        required_null = cond if required_null is None else (required_null | cond)

    def _finish(parsed: DataFrame) -> DataFrame:
        return parsed.select(
            F.col("seq").cast("long").alias("seq"),
            F.col("epoch").cast("long").alias("epoch"),
            "op",
            "url",
            "warc_ts",
            F.unbase64(F.col("html")).alias("html"),
            "lang",
        )

    if on_malformed == "fail":
        raw = (
            spark.read.schema(T.StructType(_JSONL_WIRE_SCHEMA.fields[:-1]))
            .option("mode", "FAILFAST")
            .option("timestampFormat", _JSONL_TS_FMT)
            .json(path)
        )
        # FAILFAST catches unparsable lines; missing required fields parse
        # as NULL and must still be refused eagerly
        marked = raw.withColumn("__bad", required_null)
        bad_n = marked.filter(F.col("__bad")).limit(1).count()
        if bad_n:
            raise ValueError(
                f"jsonl event log at {path} has lines missing required "
                f"fields {_REQUIRED_EVENT_FIELDS}; use on_malformed='quarantine' to dead-letter them"
            )
        return _finish(raw)

    raw = (
        spark.read.schema(_JSONL_WIRE_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .option("timestampFormat", _JSONL_TS_FMT)
        .json(path)
    )
    bad_cond = F.col("_corrupt_record").isNotNull() | required_null
    events = _finish(raw.filter(~bad_cond))
    bad = raw.filter(bad_cond).select(
        F.coalesce(
            F.col("_corrupt_record"),
            F.to_json(F.struct(*[F.col(f.name) for f in _JSONL_WIRE_SCHEMA.fields[:-1]])),
        ).alias("raw_line")
    )
    return events, bad
