"""Incremental downstream aggregates — the aggregator-task analog.

The reference chains per-interval tasks off the parser output
(`/root/reference/aggregator/aggregator.go:69-84`):

- **lp_history** (`aggregator/task.go:143-219`): per (pair, height) rows of
  cumulative liquidity, each run seeded from the latest stored row per pair
  and extended with only the NEW heights' transactions;
- **pair_stats_recent** (`aggregator/task.go:308-394`): a sliding 48 h stats
  window maintained incrementally — only transactions after the last
  processed height are aggregated in, and rows older than the window start
  are deleted in the same transaction.

Spark shape (10^10 design point):

- lp_history is an APPEND-ONLY epoch-committed table: each advance reads
  the O(|keys|) latest-state rows, aggregates only the new batch (one
  shuffle on the key), seeds the batch-local cumulative window with the
  stored latest, and appends — cost is O(batch + keys), never a recompute
  over history;
- recent stats are kept as per-(key, hour-bucket) partial aggregates in a
  keyed lake table: an advance merges bucket deltas (one bounded-size MERGE)
  and retention-deletes expired buckets; the serving view sums ≤48 buckets
  per key. Bucketing makes both the upsert and the expiry O(window), and
  the whole advance is idempotent on the batch id (exactly-once commits).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cosmwasm_etl_spark.lakehouse import LakeTable
from cosmwasm_etl_spark.operators.dedup_window import latest_wins_agg

LP_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("liq0", T.DoubleType(), False),
        T.StructField("liq1", T.DoubleType(), False),
    ]
)

BUCKET_SCHEMA = T.StructType(
    [
        T.StructField("bk", T.StringType(), False),  # "<key>|<bucket_start>"
        T.StructField("key", T.StringType(), False),
        T.StructField("bucket_ts", T.LongType(), False),  # epoch seconds
        T.StructField("vol0", T.DoubleType(), False),
        T.StructField("vol1", T.DoubleType(), False),
        T.StructField("n_txs", T.LongType(), False),
    ]
)


class IncrementalAggregates:
    """lp_history + recent-window stats, advanced once per upstream commit.

    ``txs`` batches carry (key string, height long, ts long-epoch-seconds,
    v0 double, v1 double) — the ParsedTxWithPrice analog.
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        window_hours: int = 48,
        bucket_seconds: int = 3600,
        num_buckets: int = 8,
    ):
        self.spark = spark
        self.work_dir = os.path.abspath(work_dir)
        self.window_sec = window_hours * 3600
        self.bucket_sec = bucket_seconds
        lp_path = os.path.join(self.work_dir, "lp_history")
        rc_path = os.path.join(self.work_dir, "recent_buckets")
        if LakeTable(spark, lp_path).log.exists():
            self.lp = LakeTable.load(spark, lp_path)
        else:
            self.lp = LakeTable.create(
                spark, lp_path, LP_SCHEMA, key_col="key", ts_col="height",
                num_buckets=num_buckets,
            )
        if LakeTable(spark, rc_path).log.exists():
            self.recent = LakeTable.load(spark, rc_path)
        else:
            self.recent = LakeTable.create(
                spark, rc_path, BUCKET_SCHEMA, key_col="bk", ts_col="bucket_ts",
                num_buckets=num_buckets,
            )

    # ------------------------------------------------------------ lp history

    def advance_lp_history(self, txs: DataFrame, batch_id: int) -> dict:
        """Append per-(key, height) cumulative liquidity rows for the batch.

        Exactly the reference's generateHistory recurrence
        (`task.go:143-219`): one output row per (key, height) present in the
        batch, cumulative from the latest stored liquidity per key.
        Idempotent on ``batch_id`` (epoch-checked append)."""
        if batch_id in self.lp.committed_epochs():
            return {"batch_id": batch_id, "skipped": True}
        latest = latest_wins_agg(self.lp.read(), key="key", order_cols=["height"]).select(
            F.col("key"), F.col("liq0").alias("seed0"), F.col("liq1").alias("seed1")
        )
        per_h = txs.groupBy("key", "height").agg(
            F.sum("v0").alias("d0"), F.sum("v1").alias("d1")
        )
        w = Window.partitionBy("key").orderBy("height").rowsBetween(
            Window.unboundedPreceding, 0
        )
        out = (
            per_h.join(latest, "key", "left")
            .select(
                "key",
                "height",
                (F.coalesce(F.col("seed0"), F.lit(0.0)) + F.sum("d0").over(w)).alias("liq0"),
                (F.coalesce(F.col("seed1"), F.lit(0.0)) + F.sum("d1").over(w)).alias("liq1"),
            )
        )
        res = self.lp.append(out, epoch=batch_id)
        return {"batch_id": batch_id, **res}

    def lp_history(self) -> DataFrame:
        return self.lp.read().select("key", "height", "liq0", "liq1")

    # ------------------------------------------------------------ recent 48h

    def advance_recent(self, txs: DataFrame, batch_id: int, now_ts: int) -> dict:
        """Fold the batch into hour-bucket partials; expire old buckets.

        The merge carries the batch id (skip-on-replay: a re-delivered batch
        cannot double-add into a bucket); the expiry delete is idempotent by
        predicate, mirroring the reference's upsert+delete single
        transaction (`task.go:371-386`)."""
        if batch_id in self.recent.committed_epochs():
            return {"batch_id": batch_id, "skipped": True}
        cutoff = int(now_ts) - self.window_sec
        bucket = (F.col("ts") - F.pmod(F.col("ts"), F.lit(self.bucket_sec))).cast("long")
        deltas = (
            txs.filter(F.col("ts") >= F.lit(cutoff))
            .withColumn("bucket_ts", bucket)
            .groupBy("key", "bucket_ts")
            .agg(
                F.sum("v0").alias("dv0"),
                F.sum("v1").alias("dv1"),
                F.count("*").alias("dn"),
            )
            .withColumn("bk", F.concat_ws("|", "key", "bucket_ts"))
        )
        cur = self.recent.read().select(
            "bk", F.col("vol0").alias("c0"), F.col("vol1").alias("c1"), F.col("n_txs").alias("cn")
        )
        merged = (
            deltas.join(cur, "bk", "left")
            .select(
                "bk",
                "key",
                "bucket_ts",
                (F.coalesce(F.col("c0"), F.lit(0.0)) + F.col("dv0")).alias("vol0"),
                (F.coalesce(F.col("c1"), F.lit(0.0)) + F.col("dv1")).alias("vol1"),
                (F.coalesce(F.col("cn"), F.lit(0)) + F.col("dn")).alias("n_txs"),
            )
        )
        res = self.recent.merge_upserts(
            merged, epoch=batch_id, op_col=None, order_cols=["bucket_ts", "n_txs"]
        )
        # expire at bucket-END granularity: a bucket straddling the cutoff
        # still holds in-window txs (ingest filters by exact ts), so it is
        # kept until its whole span has expired; ts_upper prunes files whose
        # bucket_ts stats lie wholly at/after the expiry bound from metadata
        self.recent.delete_where(
            f"bucket_ts + {self.bucket_sec} <= {cutoff}",
            ts_upper=cutoff - self.bucket_sec + 1,
        )
        return {"batch_id": batch_id, **res}

    def advance_all(self, txs: DataFrame, batch_id: int, now_ts: int) -> dict:
        """The scheduler-DAG analog (`aggregator/aggregator.go:69-84`): the
        reference chains router → lp_history → price → recent/pair/account
        stats, each task gated on its parents having reached the height.
        Here the barrier is structural: tasks run sequentially per upstream
        commit, each epoch-idempotent on the same ``batch_id`` — a crash
        between tasks is healed by re-advancing (completed tasks skip)."""
        r1 = self.advance_lp_history(txs, batch_id)
        r2 = self.advance_recent(txs, batch_id, now_ts)
        return {"batch_id": batch_id, "lp_history": r1, "recent": r2}

    def recent_stats(self, now_ts: int) -> DataFrame:
        """Per-key stats over the live window (≤ window_hours of buckets)."""
        cutoff = int(now_ts) - self.window_sec
        return (
            self.recent.read()
            .filter(F.col("bucket_ts") + F.lit(self.bucket_sec) > F.lit(cutoff))
            .groupBy("key")
            .agg(
                F.sum("vol0").alias("vol0"),
                F.sum("vol1").alias("vol1"),
                F.sum("n_txs").alias("n_txs"),
            )
        )


PAIR30_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.StringType(), False),  # "<window>|<type>|<user>"
        T.StructField("window_start", T.LongType(), False),  # epoch seconds
        T.StructField("event_type", T.StringType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
        T.StructField("sum_value", T.DoubleType(), False),
        T.StructField("sum_high", T.DoubleType(), True),  # NULL until a row qualifies
        T.StructField("last_batch", T.LongType(), False),
    ]
)

ACCOUNT_SCHEMA = T.StructType(
    [
        T.StructField("pk", T.StringType(), False),  # user id as string key
        T.StructField("user_id", T.LongType(), False),
        T.StructField("sum_purchase", T.DoubleType(), False),
        T.StructField("sum_click", T.DoubleType(), False),
        T.StructField("last_batch", T.LongType(), False),
    ]
)


class WindowedStatsAggregates:
    """Incremental pair_stats_30m + account_stats — the reference's two
    remaining scheduled aggregator tasks as chained incremental jobs.

    Reference semantics: the 30-minute tumbling pair stats
    (`/root/reference/aggregator/task.go:396-556`, SQL
    `pkg/db/parser/repository.go:285-446`) and the account stats
    (`pkg/db/parser/repository.go:462-533`,
    `aggregator/repo/repository.go:220-248`), both driven by the windowed
    catch-up scheduler (`aggregator/scheduler.go:54-92`). Here catch-up is
    structural: advances are chained off each upstream commit via
    ``post_commit`` and are epoch-idempotent on the batch id, so a crashed
    or lagging downstream replays exactly the missed batches (the healing
    path tested in test_aggregates).

    Physical shape (100 TB design point): the stored partials are keyed at
    **(window, type, user)** grain — the finest grain any served stat needs
    — which makes every serving aggregate (including DISTINCT user counts,
    which do NOT merge from coarser partials) a pure sum/count over the
    partial table. Each advance is one groupBy over the batch plus one
    bounded keyed MERGE (cost O(batch ∪ touched partials), never a
    recompute over history); the serving views are one shuffle over the
    partial table, whose size is bounded by active (window × type × user)
    combinations, not by the event count.

    The one-shot oracles are the driver-verified ``windowed_stats_30m`` and
    ``net_position`` queries: pytest asserts incremental == one-shot across
    arbitrary batch splits and restarts.
    """

    def __init__(
        self,
        spark: SparkSession,
        work_dir: str,
        window_seconds: int = 1800,
        high_value: float = 5.0,
        num_buckets: int = 8,
    ):
        self.spark = spark
        self.work_dir = os.path.abspath(work_dir)
        self.window_sec = int(window_seconds)
        self.high_value = float(high_value)
        p30_path = os.path.join(self.work_dir, "pair_stats_30m")
        acct_path = os.path.join(self.work_dir, "account_stats")
        if LakeTable(spark, p30_path).log.exists():
            self.pair30 = LakeTable.load(spark, p30_path)
        else:
            self.pair30 = LakeTable.create(
                spark, p30_path, PAIR30_SCHEMA, key_col="pk", ts_col="window_start",
                num_buckets=num_buckets,
            )
        if LakeTable(spark, acct_path).log.exists():
            self.acct = LakeTable.load(spark, acct_path)
        else:
            self.acct = LakeTable.create(
                spark, acct_path, ACCOUNT_SCHEMA, key_col="pk", ts_col="last_batch",
                num_buckets=num_buckets,
            )

    # ------------------------------------------------------- pair stats 30m

    def advance_pair30(self, events: DataFrame, batch_id: int) -> dict:
        """Fold one batch of events into the (window, type, user) partials.

        ``events``: (user_id long, ts timestamp, event_type string,
        value double) — the parsed-tx analog. Idempotent on ``batch_id``."""
        if batch_id in self.pair30.committed_epochs():
            return {"batch_id": batch_id, "skipped": True}
        win = (
            F.floor(F.unix_timestamp("ts") / F.lit(self.window_sec)) * self.window_sec
        ).cast("long")
        deltas = (
            events.groupBy(
                win.alias("window_start"), "event_type", "user_id"
            )
            .agg(
                F.count("*").alias("dn"),
                F.sum("value").alias("dv"),
                F.sum(F.when(F.col("value") > self.high_value, F.col("value"))).alias("dh"),
            )
            .withColumn("pk", F.concat_ws("|", "window_start", "event_type", "user_id"))
        )
        cur = self.pair30.read().select(
            "pk", F.col("n").alias("cn"), F.col("sum_value").alias("cv"), F.col("sum_high").alias("ch")
        )
        merged = deltas.join(cur, "pk", "left").select(
            "pk",
            "window_start",
            "event_type",
            "user_id",
            (F.coalesce(F.col("cn"), F.lit(0)) + F.col("dn")).alias("n"),
            (F.coalesce(F.col("cv"), F.lit(0.0)) + F.col("dv")).alias("sum_value"),
            # NULL + NULL stays NULL (no qualifying row yet) — matches the
            # one-shot conditional sum's NULL semantics
            F.when(
                F.col("ch").isNull() & F.col("dh").isNull(), F.lit(None).cast("double")
            )
            .otherwise(F.coalesce(F.col("ch"), F.lit(0.0)) + F.coalesce(F.col("dh"), F.lit(0.0)))
            .alias("sum_high"),
            F.lit(int(batch_id)).cast("long").alias("last_batch"),
        )
        # force: a merged row is ALWAYS current+delta — the newest state by
        # construction — so the replace must be unconditional; an order
        # comparison on batch id would silently drop the accumulation when
        # batches are advanced out of id order (epoch idempotency alone
        # guards double-application).
        res = self.pair30.merge_upserts(merged, epoch=batch_id, op_col=None, force=True, prestaged=True)
        return {"batch_id": batch_id, **res}

    def pair_stats_30m(self) -> DataFrame:
        """Serving view == the one-shot windowed_stats_30m query: per
        (window, type) counts, DISTINCT users (count of user-grain partial
        rows), sums, conditional sums."""
        return (
            self.pair30.read()
            .groupBy(
                F.timestamp_seconds(F.col("window_start")).alias("window_start"),
                "event_type",
            )
            .agg(
                F.sum("n").alias("n_events"),
                F.count("*").alias("n_users"),
                F.round(F.sum("sum_value"), 6).alias("sum_value"),
                F.round(F.sum("sum_high"), 6).alias("sum_high"),
            )
        )

    # ------------------------------------------------------- account stats

    def advance_account(self, events: DataFrame, batch_id: int) -> dict:
        """Fold one batch into per-user purchase/click accumulators
        (`pkg/db/parser/repository.go:462-533` analog)."""
        if batch_id in self.acct.committed_epochs():
            return {"batch_id": batch_id, "skipped": True}
        deltas = (
            events.filter(F.col("event_type").isin("purchase", "click"))
            .groupBy("user_id")
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), F.lit(0.0)
                ).alias("dp"),
                F.coalesce(
                    F.sum(F.when(F.col("event_type") == "click", F.col("value"))), F.lit(0.0)
                ).alias("dc"),
            )
            .withColumn("pk", F.col("user_id").cast("string"))
        )
        cur = self.acct.read().select(
            "pk", F.col("sum_purchase").alias("cp"), F.col("sum_click").alias("cc")
        )
        merged = deltas.join(cur, "pk", "left").select(
            "pk",
            "user_id",
            (F.coalesce(F.col("cp"), F.lit(0.0)) + F.col("dp")).alias("sum_purchase"),
            (F.coalesce(F.col("cc"), F.lit(0.0)) + F.col("dc")).alias("sum_click"),
            F.lit(int(batch_id)).cast("long").alias("last_batch"),
        )
        # force=True for the same reason as advance_pair30: merged rows are
        # unconditionally the newest accumulated state
        res = self.acct.merge_upserts(merged, epoch=batch_id, op_col=None, force=True, prestaged=True)
        return {"batch_id": batch_id, **res}

    def account_stats(self) -> DataFrame:
        """Serving view == the one-shot net_position query (A7 analog)."""
        return self.acct.read().select(
            "user_id",
            F.round("sum_purchase", 6).alias("sum_purchase"),
            F.round("sum_click", 6).alias("sum_click"),
            F.round(F.round("sum_purchase", 6) - F.round("sum_click", 6), 6).alias("net"),
            F.greatest(
                F.round("sum_purchase", 6), F.round("sum_click", 6)
            ).alias("max_side"),
        )

    def advance_all(self, events: DataFrame, batch_id: int) -> dict:
        """Both tasks per upstream commit, sequential (the T6 barrier shape
        shared with IncrementalAggregates.advance_all)."""
        r1 = self.advance_pair30(events, batch_id)
        r2 = self.advance_account(events, batch_id)
        return {"batch_id": batch_id, "pair30": r1, "account": r2}
