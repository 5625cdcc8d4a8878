"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship CDC apply — deterministic synthetic change-event
  log → quarantine-check → latest-wins dedup → Arrow html→text extraction →
  exactly-once MERGE into the lakehouse pages table → returns the final pages
  state (plus a replay-equivalence audit that must come back clean).
- ``queries()`` / ``oracle_sql()``: one entry per implemented operator from
  SURVEY.md §2 (see cosmwasm_etl_spark/queries.py).
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay on a deterministic synthetic event log.

    Loads sf0.001 parquet (TESTDATA contract) to seed scale parameters, then
    runs the engine end-to-end in a temp workspace and returns the final
    pages table state. Raises if the replay-equivalence audit finds any
    divergence.
    """
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table
    from cosmwasm_etl_spark.sources.eventlog import synthetic_events

    # seed event volume from the sf0.001 events table (keeps the contract of
    # "load sf0.001 parquet" while the CDC log itself is the FIXTURES.md §1
    # deterministic synthetic stream)
    seed_rows = spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    n_events = max(int(seed_rows) * 5, 5_000)

    events = synthetic_events(spark, n_events, n_urls=max(n_events // 10, 100), events_per_epoch=max(n_events // 10, 1))
    work = tempfile.mkdtemp(prefix="spark_graft_entry_")
    try:
        table = create_pages_table(spark, f"{work}/pages", num_buckets=8)
        pipe = CdcPipeline(spark, table, f"{work}/work")
        pipe.run_replay(events, epochs_per_batch=2)
        n_diff = pipe.audit(events).count()
        if n_diff != 0:
            raise AssertionError(f"replay-equivalence audit failed: {n_diff} divergent urls")
        # materialize to parquet (kept for the session's lifetime) instead of
        # round-tripping rows through the driver — the flagship path must
        # stay distributed end-to-end
        out_dir = tempfile.mkdtemp(prefix="spark_graft_entry_out_")
        pipe.pages().select("url", "warc_ts", "text", "lang").write.mode("overwrite").parquet(
            out_dir
        )
        return spark.read.parquet(out_dir).orderBy("url")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cosmwasm_etl_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cosmwasm_etl_spark.queries import build_oracles

    return build_oracles()
