"""Named query surface: every implemented operator from SURVEY.md §2 as a
(spark_callable, oracle_sql) pair over the driver's parquet tables.

Each Spark implementation uses the engine's operator library; each oracle is
ANSI SQL DuckDB runs on the same tables. Column names and rounding are kept
identical on both sides (the driver hash-compares values by sorted column
name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cosmwasm_etl_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from cosmwasm_etl_spark.functions.multimodal import extract_media_features, synthetic_media
from cosmwasm_etl_spark.functions.similarity import cosine_topk, lsh_bucketed_topk
from cosmwasm_etl_spark.functions.text import (
    LANG_PROFILES,
    bpe_ish_token_count,
    char_classes,
    doc_fingerprint,
    gopher_quality_ok,
    lang_id,
    repetition_stats,
    token_count,
    tokens,
)
from cosmwasm_etl_spark.operators.asof import asof_join
from cosmwasm_etl_spark.operators.rank_anti import multiset_anti_join
from cosmwasm_etl_spark.operators.topk import first_per_key, top1_per_key
from cosmwasm_etl_spark.operators.validation import full_outer_diff
from cosmwasm_etl_spark.routing import routes_df


def _spread(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Scale-adaptive scan parallelism (guide §2: derive partitioning from
    input size, never a constant tuned to one deployment).

    A single-row-group parquet file yields ONE scan split — Spark cannot
    split inside a row group — so every heavy per-row projection (tokenize,
    shingle, minhash, quality folds) would run on one core while the rest
    of the cluster idles (measured: gopher_quality 3.2 s single-task vs
    0.4 s spread at sf0.1). When the scan has fewer splits than the
    session's default parallelism, round-robin repartition up to it; at
    corpus scale the file set already provides >= cores splits and this is
    a no-op, so no corpus-wide shuffle is ever introduced."""
    par = spark.sparkContext.defaultParallelism
    try:
        n = df.rdd.getNumPartitions()
    except Exception:  # defensive: an unreadable plan must not kill a query
        return df
    return df.repartition(par) if n < par else df


# tables whose queries do heavy PER-ROW compute (tokenize/shingle/vector
# folds): spreading a one-split scan across cores wins big there (measured
# gopher_quality 3.2 s → 0.6 s). Row-light tables (events/lineitem) are
# NOT spread — their queries immediately hash-exchange anyway, and the
# extra round-robin pass measurably costs more than it saves.
_SPREAD_TABLES = {"documents", "embeddings"}


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return _spread(spark, df) if name in _SPREAD_TABLES else df


# =====================================================================
# CDC / aggregator-analog operators (FIXTURES.md §6)
# =====================================================================

def q_latest_per_key(spark, sf_dir):
    """W5 latest-wins (`parser/dex/repo/repository.go:117` + ordered replay)."""
    ev = _t(spark, sf_dir, "events")
    return top1_per_key(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id", "event_id", "ts", "event_type", F.round("value", 6).alias("value")
    )


SQL_LATEST_PER_KEY = """
SELECT user_id, event_id, ts, event_type, round(value, 6) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
      FROM events) WHERE rn = 1
"""


def q_first_event_per_key(spark, sf_dir):
    """W3 new-accounts-in-window (`pkg/db/parser/repository.go:711-720`)."""
    ev = _t(spark, sf_dir, "events")
    first = first_per_key(ev, ["user_id"], ["ts", "event_id"])
    return first.filter(
        (F.col("ts") >= "2024-01-01") & (F.col("ts") < "2024-01-16")
    ).select("user_id", "event_id", "ts", "event_type")


SQL_FIRST_EVENT_PER_KEY = """
SELECT user_id, event_id, ts, event_type
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) rn
      FROM events)
WHERE rn = 1 AND ts >= TIMESTAMP '2024-01-01' AND ts < TIMESTAMP '2024-01-16'
"""


def q_asof_join(spark, sf_dir):
    """J3/J4 lateral as-of (`pkg/db/parser/repository.go:321-325`): for each
    click, the latest purchase value at-or-before it, per user."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts", "value")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value", "event_id")
    out = asof_join(
        clicks,
        purchases.withColumnRenamed("value", "purchase_value").withColumnRenamed("event_id", "p_id"),
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_value"],
        right_seq="p_id",
    )
    return out.select(
        "event_id", "user_id", "ts", F.round("value", 6).alias("value"),
        F.round("purchase_value", 6).alias("purchase_value"),
    )


SQL_ASOF_JOIN = """
SELECT e.event_id, e.user_id, e.ts, round(e.value, 6) AS value,
       round(p.value, 6) AS purchase_value
FROM events e
LEFT JOIN LATERAL (
  SELECT value FROM events p
  WHERE p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts
  ORDER BY p.ts DESC, p.event_id DESC LIMIT 1
) p ON TRUE
WHERE e.event_type = 'click'
"""


def q_windowed_stats_30m(spark, sf_dir):
    """T4/A2/A3 30-min tumbling stats (`aggregator/scheduler.go:107`,
    `pkg/db/parser/repository.go:286-331`): per (window, type) counts,
    conditional sums, exact distinct users."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "30 minutes").start.alias("window_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.sum(F.when(F.col("value") > 5.0, F.col("value"))), 6).alias("sum_high"),
        )
    )


SQL_WINDOWED_STATS_30M = """
SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       round(sum(value), 6) AS sum_value,
       round(sum(value) FILTER (WHERE value > 5.0), 6) AS sum_high
FROM events GROUP BY 1, 2
"""


def q_running_total(spark, sf_dir):
    """A4 cumulative sums (`aggregator/task.go:143-219`)."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id", "user_id", "ts",
        F.round("value", 6).alias("value"),
        F.round(F.sum("value").over(w), 6).alias("running_value"),
    )


SQL_RUNNING_TOTAL = """
SELECT event_id, user_id, ts, round(value, 6) AS value,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS running_value
FROM events
"""


def q_group_top1(spark, sf_dir):
    """J12 group-max join (`aggregator/repo/repository.go:104-116`)."""
    ev = _t(spark, sf_dir, "events")
    return top1_per_key(ev, ["user_id", "event_type"], ["value", "event_id"]).select(
        "user_id", "event_type", "event_id", "ts", F.round("value", 6).alias("value")
    )


SQL_GROUP_TOP1 = """
SELECT user_id, event_type, event_id, ts, round(value, 6) AS value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY value DESC, event_id DESC) rn
      FROM events) WHERE rn = 1
"""


def q_dedup_anti_join(spark, sf_dir):
    """J8 RemoveDuplicatedTxs (`parser/dex/dex.go:734-792`): each view event
    cancels exactly one click with the same (user, floor(value)) key."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").withColumn(
        "vkey", F.floor("value").cast("long")
    )
    views = ev.filter(F.col("event_type") == "view").withColumn(
        "vkey", F.floor("value").cast("long")
    )
    out = multiset_anti_join(
        clicks, views, keys=["user_id", "vkey"],
        left_order=["ts", "event_id"], right_order=["ts", "event_id"],
    )
    return out.select("event_id", "user_id", "ts", F.round("value", 6).alias("value"))


SQL_DEDUP_ANTI_JOIN = """
WITH l AS (
  SELECT event_id, user_id, ts, value, CAST(floor(value) AS BIGINT) vkey,
         row_number() OVER (PARTITION BY user_id, CAST(floor(value) AS BIGINT)
                            ORDER BY ts, event_id) occ
  FROM events WHERE event_type = 'click'
), r AS (
  SELECT user_id, CAST(floor(value) AS BIGINT) vkey,
         row_number() OVER (PARTITION BY user_id, CAST(floor(value) AS BIGINT)
                            ORDER BY ts, event_id) occ
  FROM events WHERE event_type = 'view'
)
SELECT event_id, user_id, ts, round(value, 6) AS value FROM l
WHERE NOT EXISTS (SELECT 1 FROM r WHERE r.user_id = l.user_id AND r.vkey = l.vkey AND r.occ = l.occ)
"""


def q_full_outer_validation(spark, sf_dir):
    """J6/T9 state diff (`parser/dex/dex.go:537-602`): expected vs actual
    per-user counters, mismatches classified."""
    ev = _t(spark, sf_dir, "events")
    expected = ev.filter(F.col("event_type") == "click").groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    actual = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    return full_outer_diff(expected, actual, keys=["user_id"], compare_cols=["n"])


SQL_FULL_OUTER_VALIDATION = """
WITH e AS (SELECT user_id, count(*) n FROM events WHERE event_type='click' GROUP BY 1),
     a AS (SELECT user_id, count(*) n FROM events WHERE event_type='view' GROUP BY 1)
SELECT coalesce(e.user_id, a.user_id) AS user_id,
       CASE WHEN a.user_id IS NULL THEN 'missing_in_actual'
            WHEN e.user_id IS NULL THEN 'missing_in_expected'
            WHEN e.n IS DISTINCT FROM a.n THEN 'value_mismatch' END AS mismatch
FROM e FULL OUTER JOIN a ON e.user_id = a.user_id
WHERE (a.user_id IS NULL) OR (e.user_id IS NULL) OR (e.n IS DISTINCT FROM a.n)
"""


def q_net_position(spark, sf_dir):
    """A7 net-position account stats with conditional sums + greatest
    (`pkg/db/parser/repository.go:462-533`, greatest at `:521`)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy("user_id")
        .agg(
            F.round(F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), F.lit(0.0)), 6).alias("sum_purchase"),
            F.round(F.coalesce(F.sum(F.when(F.col("event_type") == "click", F.col("value"))), F.lit(0.0)), 6).alias("sum_click"),
        )
        .select(
            "user_id", "sum_purchase", "sum_click",
            F.round(F.col("sum_purchase") - F.col("sum_click"), 6).alias("net"),
            F.greatest("sum_purchase", "sum_click").alias("max_side"),
        )
    )


SQL_NET_POSITION = """
WITH g AS (
  SELECT user_id,
         round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0.0), 6) AS sum_purchase,
         round(coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0.0), 6) AS sum_click
  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1
)
SELECT user_id, sum_purchase, sum_click,
       round(sum_purchase - sum_click, 6) AS net,
       greatest(sum_purchase, sum_click) AS max_side
FROM g
"""


def q_lp_history(spark, sf_dir):
    """lp_history analog (`aggregator/task.go:143-219`): per (key, day) rows
    of END-OF-DAY cumulative two-sided liquidity from the event stream.
    Incremental per-commit maintenance of the same result is exercised in
    tests/test_aggregates.py; this is the one-shot equivalent."""
    ev = _t(spark, sf_dir, "events")
    per = (
        ev.filter(F.col("event_type").isin("purchase", "click"))
        .groupBy(
            "user_id",
            F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("day"),
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))).alias("d0"),
            F.sum(F.when(F.col("event_type") == "click", F.col("value"))).alias("d1"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return per.select(
        "user_id",
        "day",
        F.round(F.sum(F.coalesce(F.col("d0"), F.lit(0.0))).over(w), 6).alias("liq0"),
        F.round(F.sum(F.coalesce(F.col("d1"), F.lit(0.0))).over(w), 6).alias("liq1"),
    )


SQL_LP_HISTORY = """
WITH per AS (
  SELECT user_id, CAST(floor(epoch(ts)/86400) AS BIGINT) AS day,
         sum(value) FILTER (WHERE event_type = 'purchase') AS d0,
         sum(value) FILTER (WHERE event_type = 'click') AS d1
  FROM events WHERE event_type IN ('purchase', 'click') GROUP BY 1, 2
)
SELECT user_id, day,
       round(sum(coalesce(d0, 0)) OVER (PARTITION BY user_id ORDER BY day), 6) AS liq0,
       round(sum(coalesce(d1, 0)) OVER (PARTITION BY user_id ORDER BY day), 6) AS liq1
FROM per
"""


def q_recent_stats_48h(spark, sf_dir):
    """pair_stats_recent analog (`aggregator/task.go:308-394`): per-key
    volume/count stats over the trailing 48 h window ending at the stream's
    max timestamp. The incremental bucket-merge + expiry maintenance is
    exercised in tests/test_aggregates.py."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_timestamp("ts")).alias("mx"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.unix_timestamp("ts") >= F.col("mx") - F.lit(48 * 3600))
        .groupBy("user_id")
        .agg(
            F.round(F.coalesce(F.sum(F.when(F.col("event_type") == "purchase", F.col("value"))), F.lit(0.0)), 6).alias("vol0"),
            F.round(F.coalesce(F.sum(F.when(F.col("event_type") == "click", F.col("value"))), F.lit(0.0)), 6).alias("vol1"),
            F.count("*").alias("n_txs"),
        )
    )


SQL_RECENT_STATS_48H = """
WITH mx AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS mx FROM events)
SELECT user_id,
       round(coalesce(sum(value) FILTER (WHERE event_type = 'purchase'), 0.0), 6) AS vol0,
       round(coalesce(sum(value) FILTER (WHERE event_type = 'click'), 0.0), 6) AS vol1,
       count(*) AS n_txs
FROM events, mx
WHERE CAST(floor(epoch(ts)) AS BIGINT) >= mx.mx - 48*3600
GROUP BY 1
"""


# =====================================================================
# TPC-H-shaped operators (J1/J2/J7, A2/A3/A8, P3-P6)
# =====================================================================

def q_pricing_summary(spark, sf_dir):
    """A2/A3/P4 grouped conditional aggregates with FILTER
    (`pkg/db/parser/repository.go:286-331`)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(
                F.sum(F.when(F.col("l_shipdate") < "2024-06-01", F.col("l_quantity"))), 4
            ).alias("sum_qty_early"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 4) AS sum_qty,
       round(sum(l_extendedprice), 4) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       round(sum(l_quantity) FILTER (WHERE l_shipdate < TIMESTAMP '2024-06-01'), 4) AS sum_qty_early,
       count(DISTINCT l_orderkey) AS n_orders,
       count(*) AS count_order
FROM lineitem GROUP BY 1, 2
"""


def q_decimal_turnover(spark, sf_dir):
    """Exact-decimal money math (SURVEY §1.2): the reference stores all
    amounts as fixed-point numeric and sums them exactly
    (`db/migrations/parser/20220711191007_create_tables.up.sql:37-42`,
    LegacyDec in `pkg/util`). This query runs the aggregation entirely in
    DecimalType(38,18) — no float in the plan — and emits canonical decimal
    strings. The reference's column type is numeric(40), two digits past
    Spark's DecimalType(38) cap; amounts beyond that are covered by the
    hi/lo split aggregation in ``decimal_turnover_wide``
    (functions/decimal40.py)."""
    li = _t(spark, sf_dir, "lineitem")
    dec = "decimal(38,18)"
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(dec)).cast(dec).alias("__sq"),
            F.sum((F.col("l_quantity") * F.col("l_linenumber")).cast(dec)).cast(dec).alias("__swq"),
            F.count("*").alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("__sq").cast("string").alias("sum_qty_exact"),
            F.col("__swq").cast("string").alias("sum_weighted_exact"),
            "n_rows",
        )
    )


SQL_DECIMAL_TURNOVER = """
SELECT l_returnflag, l_linestatus,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS VARCHAR) AS sum_qty_exact,
       CAST(CAST(sum(CAST(l_quantity * l_linenumber AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS VARCHAR) AS sum_weighted_exact,
       count(*) AS n_rows
FROM lineitem GROUP BY 1, 2
"""


def q_decimal_turnover_wide(spark, sf_dir):
    """40-digit exact-decimal aggregation (r4 verdict #7 — the reference's
    numeric(40) columns, two digits past DecimalType(38)): amounts are
    synthesized as ~40-significant-digit canonical strings from lineitem
    keys, then summed EXACTLY via the hi/lo DecimalType(38,0) split
    (functions/decimal40.py). The oracle recombines DuckDB HUGEINT sums of
    the same split — an independent wide-arithmetic implementation."""
    from cosmwasm_etl_spark.functions.decimal40 import exact_wide_sum

    li = _t(spark, sf_dir, "lineitem")
    # deterministic ~21-digit integer part + carry-heavy 18-digit fraction
    amount = F.concat(
        (F.col("l_orderkey") * 1_000_000 + F.col("l_linenumber")).cast("string"),
        F.lit("123456789012345"),
        F.lit("."),
        F.rpad(F.pmod(F.col("l_partkey"), 1_000_000).cast("string"), 18, "8"),
    )
    out = exact_wide_sum(
        li.withColumn("__amt", amount),
        ["l_returnflag", "l_linestatus"],
        "__amt",
        out_col="sum_exact",
    )
    return out.select("l_returnflag", "l_linestatus", "sum_exact", "n_rows", "n_bad")


SQL_DECIMAL_TURNOVER_WIDE = """
WITH amt AS (
  SELECT l_returnflag, l_linestatus,
         concat(CAST(l_orderkey * 1000000 + l_linenumber AS VARCHAR),
                '123456789012345') AS ip,
         rpad(CAST(l_partkey % 1000000 AS VARCHAR), 18, '8') AS fp
  FROM lineitem
), parts AS (
  SELECT l_returnflag, l_linestatus,
         CAST(ip AS HUGEINT) AS hi,
         CAST(fp AS HUGEINT) AS lo
  FROM amt
), agg AS (
  SELECT l_returnflag, l_linestatus,
         sum(hi) AS sh, sum(lo) AS sl, count(*) AS n
  FROM parts GROUP BY 1, 2
)
SELECT l_returnflag, l_linestatus,
       concat(CAST(sh + sl // 1000000000000000000 AS VARCHAR), '.',
              lpad(CAST(sl % 1000000000000000000 AS VARCHAR), 18, '0')) AS sum_exact,
       n AS n_rows,
       CAST(0 AS BIGINT) AS n_bad
FROM agg
"""


def q_parts_revenue(spark, sf_dir):
    """J1/J2 double broadcast dim join + computed projection
    (`pkg/db/parser/repository.go:183-186`, `:303-306`)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("p_brand", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


SQL_PARTS_REVENUE = """
SELECT p_brand, n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY 1, 2
"""


def q_semi_join_orders(spark, sf_dir):
    """J7 semi-join via IN-subquery (`pkg/db/parser/repository.go:867`)."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    seg = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return (
        orders.join(F.broadcast(seg), orders.o_custkey == seg.c_custkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 4).alias("total"))
    )


SQL_SEMI_JOIN_ORDERS = """
SELECT o_orderpriority, count(*) AS n_orders, round(sum(o_totalprice), 4) AS total
FROM orders
WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
GROUP BY 1
"""


def q_routes(spark, sf_dir):
    """G1 bounded-DFS route enumeration (`pkg/dex/router/route_info.go:108-181`,
    max 4 hops `pkg/dex/router/constants.go:3`) over the nation/region clique
    graph — driver-side DFS, result broadcast-sized."""
    nation = _t(spark, sf_dir, "nation").select("n_name", "n_regionkey").collect()
    edges = [
        (a.n_name, b.n_name)
        for a in nation
        for b in nation
        if a.n_regionkey == b.n_regionkey and a.n_name < b.n_name
    ]
    return routes_df(spark, edges, max_hops=4)


def q_price_series(spark, sf_dir):
    """G4 price pipeline (`pkg/dex/price/price.go:79-294`): per-height direct
    + route-mediated price series over a deterministic chain market derived
    from events (tokens t0..t8, pair j = (t_j, t_{j+1}) = user_id % 8,
    height = epoch-day, reserves = cumulative swap deposits). Exercises
    direct pricing, route products, the liquidity threshold, and the
    swap-price fix rule; multi-route optimal-pick parity is covered by
    tests/test_price.py against routing.best_route."""
    from cosmwasm_etl_spark.price import price_series

    ev = _t(spark, sf_dir, "events")
    pair = (F.col("user_id") % 8).cast("int")
    sw = ev.filter(F.col("event_type") == "purchase").select(
        F.concat(F.lit("t"), pair.cast("string")).alias("a"),
        F.concat(F.lit("t"), (pair + 1).cast("string")).alias("b"),
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("height"),
        (F.col("value") + 1.0).alias("a0"),
        ((F.col("value") + 1.0) * (1.0 + ((F.col("event_id") % 7) + 1) / 10.0)).alias("a1"),
        F.col("event_id").alias("swap_id"),
    )
    edges = [(f"t{i}", f"t{i+1}") for i in range(8)]
    out = price_series(sw, spark, edges, base="t0", threshold=2000.0, max_hops=8)
    return out.select(
        F.col("height").cast("long").alias("height"),
        "token",
        "method",
        F.round("price", 4).alias("price"),
    )


SQL_PRICE_SERIES = """
WITH swaps AS (
  SELECT CAST(user_id % 8 AS INT) AS pair,
         CAST(floor(epoch(ts)/86400) AS BIGINT) AS h,
         value + 1.0 AS a0,
         (value + 1.0) * (1.0 + (event_id % 7 + 1)/10.0) AS a1,
         event_id
  FROM events WHERE event_type = 'purchase'
), per AS (
  SELECT pair, h, sum(a0) d0, sum(a1) d1 FROM swaps GROUP BY 1, 2
), grid AS (
  SELECT p.pair, hh.h FROM (SELECT DISTINCT pair FROM swaps) p
  CROSS JOIN (SELECT DISTINCT h FROM swaps) hh
), res AS (
  SELECT g.pair, g.h,
         sum(coalesce(d0, 0)) OVER (PARTITION BY g.pair ORDER BY g.h) AS r0,
         sum(coalesce(d1, 0)) OVER (PARTITION BY g.pair ORDER BY g.h) AS r1
  FROM grid g LEFT JOIN per ON per.pair = g.pair AND per.h = g.h
), rp AS (
  SELECT pair AS k, h,
         exp(sum(ln(CASE WHEN least(r0, r1) >= 2000.0 THEN r0/r1 ELSE 1.0 END))
             OVER w) AS rpk,
         min(least(r0, r1)) OVER w AS minres
  FROM res
  WINDOW w AS (PARTITION BY h ORDER BY pair
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
), lastsw AS (
  SELECT pair, h, arg_max(a0, event_id) a0l, arg_max(a1, event_id) a1l
  FROM swaps GROUP BY 1, 2
)
SELECT h AS height, 't' || CAST(pair + 1 AS VARCHAR) AS token,
       'direct' AS method, round(a0l/a1l, 4) AS price
FROM lastsw WHERE pair = 0
UNION ALL
SELECT l.h, 't' || CAST(l.pair AS VARCHAR), 'route', round(rp.rpk, 4)
FROM lastsw l JOIN rp ON rp.h = l.h AND rp.k = l.pair
WHERE l.pair >= 1 AND rp.minres >= 2000.0
UNION ALL
SELECT l.h, 't' || CAST(l.pair + 1 AS VARCHAR), 'route_fixed', round(a0l/a1l*rp.rpk, 4)
FROM lastsw l JOIN rp ON rp.h = l.h AND rp.k = l.pair
WHERE l.pair >= 1 AND rp.minres >= 2000.0
"""


SQL_ROUTES = """
WITH RECURSIVE edges AS (
  SELECT a.n_name AS src, b.n_name AS dst
  FROM nation a JOIN nation b
    ON a.n_regionkey = b.n_regionkey AND a.n_name <> b.n_name
), paths AS (
  SELECT src, dst, src || '->' || dst AS route, 1 AS hops, [src, dst] AS visited FROM edges
  UNION ALL
  SELECT p.src, e.dst, p.route || '->' || e.dst, p.hops + 1, list_append(p.visited, e.dst)
  FROM paths p JOIN edges e ON p.dst = e.src
  WHERE p.hops < 4 AND NOT list_contains(p.visited, e.dst)
)
SELECT src, dst, route, CAST(hops AS INT) AS hops FROM paths
"""


# =====================================================================
# Training-data pipeline operators (documents / embeddings)
# =====================================================================

_TOK_SPLIT = r"[^\p{L}\p{N}']+"
# SQL-literal variant: the embedded single quote must be doubled inside '...'
_TOK_SPLIT_SQL = r"[^\p{L}\p{N}'']+"


def q_exact_dedup_docs(spark, sf_dir):
    """Exact dedup: lowest-id representative per normalized text."""
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, text_col="text", id_col="doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


SQL_EXACT_DEDUP_DOCS = f"""
WITH norm AS (
  SELECT *, array_to_string(list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'),
                                        x -> len(x) > 0), ' ') AS nt
  FROM documents
)
SELECT doc_id, lang, source, n_chars
FROM (SELECT *, row_number() OVER (PARTITION BY nt ORDER BY doc_id) rn FROM norm)
WHERE rn = 1
"""


def q_doc_token_stats(spark, sf_dir):
    """Token counting + character-class stats (integer-exact)."""
    docs = _t(spark, sf_dir, "documents")
    cc = char_classes(F.col("text"))
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
        cc["n_chars"].alias("n_chars_m"),
        cc["n_alpha"].alias("n_alpha"),
        cc["n_digit"].alias("n_digit"),
        cc["n_punct"].alias("n_punct"),
    )


SQL_DOC_TOKEN_STATS = f"""
SELECT doc_id,
       len(list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0)) AS n_tokens,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_bpe_tokens,
       length(text) AS n_chars_m,
       length(regexp_replace(text, '[^\\p{{L}}]', '', 'g')) AS n_alpha,
       length(regexp_replace(text, '[^\\p{{N}}]', '', 'g')) AS n_digit,
       length(regexp_replace(text, '[\\p{{L}}\\p{{N}}\\s]', '', 'g')) AS n_punct
FROM documents
"""


def q_lang_id_docs(spark, sf_dir):
    """Stopword-profile language ID (argmax, deterministic tie-break)."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select("doc_id", lang_id(F.col("text")).alias("lang_pred"))


def _sql_lang_id() -> str:
    structs = []
    for code in sorted(LANG_PROFILES):
        words = ", ".join(f"'{w}'" for w in LANG_PROFILES[code])
        structs.append(
            f"{{'score': len(list_filter(toks, t -> list_contains([{words}], t))), 'code': '{code}'}}"
        )
    arr = ", ".join(structs)
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) AS toks
  FROM documents
), best AS (
  SELECT doc_id, list_max([{arr}]) AS b FROM t
)
SELECT doc_id, CASE WHEN b.score > 0 THEN b.code ELSE 'und' END AS lang_pred FROM best
"""


SQL_LANG_ID_DOCS = _sql_lang_id()


_SPLIT_WEIGHTS = {"train": 0.8, "val": 0.1, "test": 0.1}


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test assignment (training-pipeline op):
    split is a pure function of doc_id — stable across runs, partitionings
    and cluster sizes (unlike randomSplit), so eval sets never leak when
    the corpus grows. Aggregated per split (count + char checksum), which
    verifies EVERY row's assignment against the oracle. Uses the lcg hash
    family so the DuckDB oracle recomputes assignments in pure SQL; the
    production default is xxhash64 (pytest parity + dispersion tests)."""
    from cosmwasm_etl_spark.functions.sampling import split_assign

    docs = _t(spark, sf_dir, "documents")
    assign = split_assign(F.col("doc_id"), _SPLIT_WEIGHTS, hash_family="lcg")
    return (
        docs.groupBy(assign.alias("split"))
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("sum_chars"))
    )


def _sql_dataset_split() -> str:
    from cosmwasm_etl_spark.functions.sampling import lcg_sql_expr

    # cumulative thresholds as the SAME Python floats Spark uses in F.lit
    # (0.8 + 0.1 != 0.9 in IEEE — repr() keeps the two sides bit-identical)
    total = sum(_SPLIT_WEIGHTS.values())
    cases, cum = [], 0.0
    items = list(_SPLIT_WEIGHTS.items())
    for name, w in items[:-1]:
        cum += w / total
        cases.append(f"WHEN frac < {cum!r} THEN '{name}'")
    return f"""
WITH f AS (
  SELECT n_chars, {lcg_sql_expr('doc_id')} AS frac FROM documents
), a AS (
  SELECT CASE {' '.join(cases)} ELSE '{items[-1][0]}' END AS split, n_chars FROM f
)
SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars FROM a GROUP BY split
"""


SQL_DATASET_SPLIT = _sql_dataset_split()


def q_doc_length_quantiles(spark, sf_dir):
    """Exact per-source token-count quantiles by rank selection (discrete
    quantile: element at ceil(q*n) — no interpolation, so Spark and DuckDB
    agree bit-for-bit). One window pass + one grouped aggregation; at
    scale the partition key is `source`, the natural stratification
    column. (Interpolating percentile() implementations differ across
    engines — rank selection sidesteps that entire class of drift.)"""
    docs = _t(spark, sf_dir, "documents")
    t = docs.select("source", token_count(F.col("text")).alias("n_tokens"))
    w = Window.partitionBy("source").orderBy("n_tokens")
    r = t.withColumn("rn", F.row_number().over(w)).withColumn(
        "cnt", F.count("*").over(Window.partitionBy("source"))
    )

    def _at(q: float):
        idx = F.ceil(F.lit(q) * F.col("cnt"))
        return F.max(F.when(F.col("rn") == idx, F.col("n_tokens")))

    return r.groupBy("source").agg(
        F.max("cnt").alias("n_docs"),
        _at(0.5).alias("p50_tokens"),
        _at(0.9).alias("p90_tokens"),
        _at(0.99).alias("p99_tokens"),
    )


SQL_DOC_LENGTH_QUANTILES = f"""
WITH t AS (
  SELECT source,
         len(list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0)) AS n_tokens
  FROM documents
), r AS (
  SELECT source, n_tokens,
         row_number() OVER (PARTITION BY source ORDER BY n_tokens) AS rn,
         count(*) OVER (PARTITION BY source) AS cnt
  FROM t
)
SELECT source,
       max(cnt) AS n_docs,
       max(CASE WHEN rn = CAST(ceil(0.5 * cnt) AS BIGINT) THEN n_tokens END) AS p50_tokens,
       max(CASE WHEN rn = CAST(ceil(0.9 * cnt) AS BIGINT) THEN n_tokens END) AS p90_tokens,
       max(CASE WHEN rn = CAST(ceil(0.99 * cnt) AS BIGINT) THEN n_tokens END) AS p99_tokens
FROM r GROUP BY source
"""


def q_gopher_quality(spark, sf_dir):
    """Gopher-style repetition/quality signals + filter flag per document
    (Rae et al. 2021 rules, adapted to word granularity).

    Plan shape: the most-frequent-token count is the longest run in the
    SORTED token array — one ``F.aggregate`` fold per row, so the whole
    query is a single zero-shuffle projection (the textbook explode +
    two-level groupBy would shuffle rows × avg-words). The DuckDB oracle
    below IS that textbook unnest/GROUP BY formulation — two independent
    computation strategies agreeing on every value."""
    docs = _t(spark, sf_dir, "documents")
    s = repetition_stats(F.col("text"))
    return docs.select(
        "doc_id",
        s["n_words"].alias("n_words"),
        s["mean_word_len"].alias("mean_word_len"),
        s["dup_word_frac"].alias("dup_word_frac"),
        s["top_word_frac"].alias("top_word_frac"),
        s["top_bigram_frac"].alias("top_bigram_frac"),
        gopher_quality_ok(stats=s).alias("gopher_ok"),
    )


SQL_GOPHER_QUALITY = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) AS toks
  FROM documents
), base AS (
  SELECT doc_id, toks, len(toks) AS n FROM t
), words AS (
  SELECT doc_id, unnest(toks) AS w FROM base
), wstats AS (
  SELECT doc_id, max(c) AS top_c, count(*) AS n_distinct, sum(c * wl) AS sum_len
  FROM (SELECT doc_id, w, count(*) AS c, len(w) AS wl FROM words GROUP BY doc_id, w)
  GROUP BY doc_id
), bigrams AS (
  SELECT doc_id, unnest(list_transform(range(1, n), i -> toks[i] || ' ' || toks[i + 1])) AS bg
  FROM base WHERE n >= 2
), bstats AS (
  SELECT doc_id, max(c) AS top_bg
  FROM (SELECT doc_id, bg, count(*) AS c FROM bigrams GROUP BY doc_id, bg)
  GROUP BY doc_id
)
SELECT b.doc_id,
       b.n AS n_words,
       CASE WHEN b.n > 0 THEN ws.sum_len / b.n END AS mean_word_len,
       CASE WHEN b.n > 0 THEN 1.0 - ws.n_distinct / b.n END AS dup_word_frac,
       CASE WHEN b.n > 0 THEN ws.top_c / b.n END AS top_word_frac,
       CASE WHEN b.n >= 2 THEN bs.top_bg / (b.n - 1) END AS top_bigram_frac,
       (b.n >= 8 AND ws.sum_len / b.n BETWEEN 3.0 AND 10.0
        AND (1.0 - ws.n_distinct / b.n) < 0.6
        AND ws.top_c / b.n < 0.2
        AND coalesce(bs.top_bg / (b.n - 1) < 0.18, FALSE)) AS gopher_ok
FROM base b
LEFT JOIN wstats ws USING (doc_id)
LEFT JOIN bstats bs USING (doc_id)
"""


def q_ngram_lm_score(spark, sf_dir):
    """CCNet-style LM quality signal: per-document cross-entropy (and
    perplexity) under a corpus-trained add-one-smoothed bigram model —
    see functions/lm.py for the model definition and the 100 TB plan
    shape (one explode feeds training and scoring; count joins are
    shuffle equi-joins against one-row-per-key aggregate sides, not
    broadcasts — vocabulary is unbounded at corpus scale).

    The DuckDB oracle retrains the identical model relationally
    (positional unnest instead of zip_with) — two independent
    formulations agreeing on every document's score. avg() summation
    order differs between engines, hence the repo-standard round(…, 6)
    on the emitted floats (ulp discipline, cf. tfidf's rational-idf
    note)."""
    from cosmwasm_etl_spark.functions.lm import bigram_lm_score

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_score(docs, text_col="text", id_col="doc_id")


SQL_NGRAM_LM_SCORE = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) AS toks
  FROM documents
), idx AS (
  SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM t
), bgf AS (
  SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM idx
), c2 AS (
  SELECT w1, w2, count(*) AS n2 FROM bgf GROUP BY w1, w2
), c1 AS (
  SELECT w1, sum(n2) AS n1 FROM c2 GROUP BY w1
), v AS (
  SELECT count(DISTINCT w) AS vv FROM (SELECT unnest(toks) AS w FROM t)
), s AS (
  SELECT b.doc_id, ln((c2.n2 + 1.0) / (c1.n1 + v.vv)) AS lp
  FROM bgf b JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
), p AS (
  SELECT doc_id, count(*) AS n_bigrams, -avg(lp) AS ce FROM s GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       round(p.ce, 6) AS cross_entropy,
       round(exp(p.ce), 6) AS ppl
FROM documents d
LEFT JOIN p USING (doc_id)
"""


def q_tfidf_top_terms(spark, sf_dir):
    """Top-3 characteristic terms per source by a TF-IDF-style score with a
    RATIONAL idf — tf * (N - df + 0.5) / (df + 0.5), the BM25 idf core
    without the log. Deliberate: rational double arithmetic is
    bit-deterministic across engines, while ln()/log() may differ by an
    ulp between libm implementations and break value-hash comparison.

    Scale shape: one explode feeds BOTH aggregations (term frequency per
    source, document frequency per term); the df side joins back on the
    term key (a shuffle join — vocabulary is unbounded, broadcasting it
    would be wrong at corpus scale); deterministic tie-break
    (score desc, term asc) via one window per source."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(tokens(F.col("text"))).alias("term")
    )
    n_docs = docs.count()  # scalar (driver literal), the corpus size
    tf = toks.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.select("doc_id", "term").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = tf.join(df_, "term").withColumn(
        "score",
        F.col("tf")
        * (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5)),
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("source", "rank", "term", "tf", "df", "score")
    )


def _sql_tfidf_top_terms(n_docs_expr: str = "(SELECT count(*) FROM documents)") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0)) AS term
  FROM documents
), tf AS (
  SELECT source, term, count(*) AS tf FROM toks GROUP BY source, term
), df AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM toks) GROUP BY term
), scored AS (
  SELECT tf.source, tf.term, tf.tf, df.df,
         tf.tf * (CAST({n_docs_expr} AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) AS score
  FROM tf JOIN df USING (term)
)
SELECT source, rank, term, tf, df, score
FROM (SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, term) AS rank FROM scored)
WHERE rank <= 3
"""


SQL_TFIDF_TOP_TERMS = _sql_tfidf_top_terms()


def q_ngram_jaccard_pairs(spark, sf_dir):
    """n-gram Jaccard near-dup pairs (exact; LSH-bucketed at scale)."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id", n=3, threshold=0.12)


SQL_NGRAM_JACCARD_PAIRS = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) t
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                       for i in generate_series(1, len(t) - 2)])) AS s
  FROM toks WHERE len(t) >= 3
), sizes AS (
  SELECT doc_id, count(*) sz FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id id_a, b.doc_id id_b, count(*) i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.12
"""


def q_dedup_clusters(spark, sf_dir):
    """Dedup-cluster canonicalization (training-data op): connected
    components over the exact n-gram-Jaccard pair graph via iterative
    min-label propagation (diameter-bounded shuffle rounds, no driver-side
    graph state) — every doc maps to its cluster's min doc_id; singletons
    map to themselves. The DuckDB oracle recomputes components with a
    recursive CTE, so the whole pipeline (tokenize → shingle → pair →
    cluster) is value-verified end-to-end."""
    from cosmwasm_etl_spark.operators.components import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id", n=3, threshold=0.12)
    return dedup_clusters(pairs, docs.select("doc_id"))


SQL_DEDUP_CLUSTERS = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) t
  FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                       for i in generate_series(1, len(t) - 2)])) AS s
  FROM toks WHERE len(t) >= 3
), sizes AS (
  SELECT doc_id, count(*) sz FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id id_a, b.doc_id id_b, count(*) i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.12
), und AS (
  SELECT id_a a, id_b b FROM pairs UNION SELECT id_b, id_a FROM pairs
), reach(id, r) AS (
  SELECT a, a FROM und
  UNION
  SELECT u.a, reach.r FROM und u JOIN reach ON u.b = reach.id
), comp AS (
  SELECT id, min(r) AS canonical_id FROM reach GROUP BY id
), csz AS (
  SELECT canonical_id, count(*) AS n FROM comp GROUP BY 1
), clustered AS (
  SELECT comp.id AS doc_id, comp.canonical_id, csz.n AS cluster_size
  FROM comp JOIN csz USING (canonical_id)
)
SELECT doc_id, canonical_id, CAST(cluster_size AS BIGINT) AS cluster_size FROM clustered
UNION ALL
SELECT d.doc_id, d.doc_id, CAST(1 AS BIGINT)
FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM clustered)
"""


def q_cluster_retention(spark, sf_dir):
    """Near-dup retention policy (training-data op): within each dedup
    cluster keep ONE representative — the doc with the most tokens,
    tie-broken by lowest doc_id (the "keep the longest variant" rule used
    when collapsing boilerplate families). Composes the full pipeline:
    tokenize → shingle → Jaccard pairs → connected components → scored
    pick; the pick itself is ONE map-side-combined max_by aggregate (no
    window sort), so it adds a single narrow exchange on cluster id.
    Token count is integer-exact, so the oracle verifies the retention
    choice bit-for-bit."""
    from cosmwasm_etl_spark.functions.text import token_count
    from cosmwasm_etl_spark.operators.components import dedup_clusters

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, text_col="text", id_col="doc_id", n=3, threshold=0.12)
    clusters = dedup_clusters(pairs, docs.select("doc_id"))
    scored = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    j = clusters.join(scored, "doc_id")
    best = F.max_by(
        F.struct(F.col("doc_id"), F.col("n_tokens")),
        F.struct(F.col("n_tokens"), (-F.col("doc_id")).alias("neg_id")),
    )
    return (
        j.groupBy("canonical_id")
        .agg(best.alias("w"), F.max("cluster_size").alias("cluster_size"))
        .select(
            "canonical_id",
            F.col("w")["doc_id"].alias("kept_doc_id"),
            F.col("w")["n_tokens"].alias("kept_tokens"),
            F.col("cluster_size").cast("long").alias("cluster_size"),
        )
    )


SQL_CLUSTER_RETENTION = f"""
WITH tk AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0)) AS n_tokens
  FROM documents
), j AS (
  SELECT c.canonical_id, c.doc_id, c.cluster_size, tk.n_tokens
  FROM ({SQL_DEDUP_CLUSTERS}) c JOIN tk USING (doc_id)
), r AS (
  SELECT *, row_number() OVER (PARTITION BY canonical_id ORDER BY n_tokens DESC, doc_id ASC) rn
  FROM j
)
SELECT canonical_id, doc_id AS kept_doc_id, CAST(n_tokens AS INT) AS kept_tokens,
       CAST(cluster_size AS BIGINT) AS cluster_size
FROM r WHERE rn = 1
"""


def q_minhash_lsh_dups(spark, sf_dir):
    """MinHash+LSH near-dup pairs (scale path; verified by exact Jaccard).

    Hash-seeded, so not ANSI-SQL-expressible directly — the oracle is an
    expected-output parquet precomputed by the INDEPENDENT pure-Python
    XXH64 reference pipeline (functions/pyoracle.py), the same golden-
    fixture pattern the Go reference uses for its hash-dependent mappers
    (parser/dex/dezswap/mappers_test.go:16). Recall vs exact Jaccard is
    additionally asserted in tests/test_training_ops.py."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, text_col="text", id_col="doc_id", n=3, k=32, bands=8, threshold=0.12)


def q_simhash_dups(spark, sf_dir):
    """SimHash near-dup pairs (hamming ≤ 3 via 4×16-bit band pigeonhole).
    Oracle: pure-Python SimHash reference (functions/pyoracle.py) via
    expected-output parquet."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_near_dups(docs, text_col="text", id_col="doc_id", max_hamming=3)


def q_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k over embeddings (queries = vec_id<20)."""
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    queries = corpus.filter(F.col("vec_id") < 20)
    out = cosine_topk(corpus, queries, k=5)
    return out.select("query_id", "rank", "neighbor_id", F.round("cosine", 4).alias("cosine"))


SQL_COSINE_TOPK = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings),
scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round(list_dot_product(q.e, c.e) / (sqrt(list_dot_product(q.e, q.e)) * sqrt(list_dot_product(c.e, c.e))), 6) AS cosine
  FROM v q JOIN v c ON c.vec_id <> q.vec_id
  WHERE q.vec_id < 20
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id DESC) AS rank
  FROM scored
)
SELECT query_id, CAST(rank AS INT) AS rank, neighbor_id, round(cosine, 4) AS cosine
FROM ranked WHERE rank <= 5
"""


def q_embedding_near_dups(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — EXACT, via the blocked-GEMM
    engine (one numpy float64 matmul per block-pair tile instead of an
    interpreted per-pair expression fold: 20.9 s → 0.8 s at 5k vectors,
    output equal pair-for-pair to the column-expression baseline — pinned
    in pytest — and to the DuckDB oracle). The LSH-bucketed sub-quadratic
    path is cosine_near_dups_lsh, recall-tested in pytest."""
    from cosmwasm_etl_spark.functions.similarity import cosine_near_dups_blocked

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    out = cosine_near_dups_blocked(corpus, threshold=0.4, n_blocks=8)
    return out.select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))


SQL_EMBEDDING_NEAR_DUPS = """
WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) e FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(round(list_dot_product(a.e, b.e) /
             (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6), 4) AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e) /
      (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.4
"""


def q_lsh_ann(spark, sf_dir):
    """LSH-bucketed approximate NN (scale path; recall tested in pytest).
    Hash-bucket-dependent — oracle is the pure-Python hyperplane-LSH
    reference (functions/pyoracle.py) via expected-output parquet."""
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    queries = corpus.filter(F.col("vec_id") < 20)
    return lsh_bucketed_topk(corpus, queries, dim=64, k=5, n_planes=6)


def q_ivf_ann(spark, sf_dir):
    """IVF approximate NN: centroids trained driver-side on a strided
    sample (deterministic spherical k-means, the train-small/search-big
    production IVF shape), cell assignment + probed search as pure Column
    plans. Training is specified to the IEEE operation order, so the
    oracle is the INDEPENDENT pure-Python implementation of the same spec
    (functions/pyoracle.py ivf_topk_py) via expected-output parquet —
    the golden-fixture pattern (parser/dex/dezswap/mappers_test.go:16).
    Recall vs exact brute force is additionally pinned in
    tests/test_training_ops.py."""
    from cosmwasm_etl_spark.functions.similarity import ivf_topk, train_ivf_centroids

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.select("vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding"))
    cents = train_ivf_centroids(corpus, dim=64, n_cells=16, sample_cap=256, iters=2)
    queries = corpus.filter(F.col("vec_id") < 20)
    return ivf_topk(corpus, queries, cents, k=5, n_probe=4)


def q_multimodal_features(spark, sf_dir):
    """Real multimodal decode (PPM/WAV/RAWV, numpy-only) over a
    deterministic parquet media fixture shared with the DuckDB oracle.

    The oracle reads the SAME parquet file and checks Spark's DECODED values
    against independent ground truth: payload byte length (octet_length),
    image/video dimensions (the generator's metadata columns, which the
    decode must reproduce from raw bytes), and the generator-spec sample/
    frame counts. The feature vector itself is pinned by the codec
    round-trip pytests (sha256 can't be compared — DuckDB hashes VARCHAR
    only)."""
    from cosmwasm_etl_spark.functions.multimodal import ensure_media_fixture

    media = spark.read.parquet(ensure_media_fixture())
    return extract_media_features(media).select(
        "media_id",
        "kind",
        "n_bytes",
        "width",
        "height",
        "n_samples",
        "n_frames",
        F.size("feature").alias("n_feature"),
    )


def _sql_multimodal_features() -> str:
    """Built lazily (at ``oracle_sql()`` time, not import time) so a fixture
    write failure surfaces AT the oracle run, loudly, instead of silently
    embedding a nonexistent path in the SQL string."""
    from cosmwasm_etl_spark.functions.multimodal import ensure_media_fixture

    return f"""
SELECT media_id, kind,
       CAST(octet_length(payload) AS BIGINT) AS n_bytes,
       CASE WHEN kind IN ('image', 'video') THEN width END AS width,
       CASE WHEN kind IN ('image', 'video') THEN height END AS height,
       CASE WHEN kind = 'audio' THEN CAST(400 AS BIGINT) END AS n_samples,
       CASE WHEN kind = 'video' THEN CAST(4 AS INT) END AS n_frames,
       CAST(8 AS INT) AS n_feature
FROM read_parquet('{ensure_media_fixture()}')
"""


# =====================================================================
# Incremental aggregator jobs driven end-to-end as queries: the events
# table is split into deterministic batches and folded through the REAL
# incremental machinery (epoch-idempotent lake tables in a fresh temp
# workspace); the serving view is returned and hash-compared against the
# SAME DuckDB oracle as the one-shot query — so "incremental == one-shot"
# is driver-verified, not just pytest-verified.
# =====================================================================


def q_pair_stats_30m_incr(spark, sf_dir):
    """Incremental 30-min pair stats (`aggregator/task.go:396-556` analog)
    — four interleaved batches through WindowedStatsAggregates.advance_pair30
    (late data in every batch), serving view == windowed_stats_30m."""
    import tempfile

    from cosmwasm_etl_spark.aggregates import WindowedStatsAggregates

    ev = _t(spark, sf_dir, "events")
    agg = WindowedStatsAggregates(spark, tempfile.mkdtemp(prefix="q_incr_w30_"))
    for b in range(4):
        agg.advance_pair30(ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == b), b)
    return agg.pair_stats_30m()


def q_account_stats_incr(spark, sf_dir):
    """Incremental account stats (`pkg/db/parser/repository.go:462-533`
    analog) — batched advance_account, serving view == net_position."""
    import tempfile

    from cosmwasm_etl_spark.aggregates import WindowedStatsAggregates

    ev = _t(spark, sf_dir, "events")
    agg = WindowedStatsAggregates(spark, tempfile.mkdtemp(prefix="q_incr_acct_"))
    for b in range(4):
        agg.advance_account(ev.filter(F.pmod(F.col("event_id"), F.lit(4)) == b), b)
    return agg.account_stats()


def q_price_series_incr(spark, sf_dir):
    """Cursor-seeded incremental price advance
    (`pkg/dex/price/repository.go:69-90` NextHeight analog) — the chain
    market of q_price_series folded in three ascending height ranges;
    price rows == the one-shot price_series oracle."""
    import tempfile

    from cosmwasm_etl_spark.price import IncrementalPrice

    ev = _t(spark, sf_dir, "events")
    pair = (F.col("user_id") % 8).cast("int")
    sw = ev.filter(F.col("event_type") == "purchase").select(
        F.concat(F.lit("t"), pair.cast("string")).alias("a"),
        F.concat(F.lit("t"), (pair + 1).cast("string")).alias("b"),
        F.floor(F.unix_timestamp("ts") / F.lit(86400)).cast("long").alias("height"),
        (F.col("value") + 1.0).alias("a0"),
        ((F.col("value") + 1.0) * (1.0 + ((F.col("event_id") % 7) + 1) / 10.0)).alias("a1"),
        F.col("event_id").alias("swap_id"),
    )
    edges = [(f"t{i}", f"t{i+1}") for i in range(8)]
    inc = IncrementalPrice(
        spark, tempfile.mkdtemp(prefix="q_incr_price_"), edges, base="t0",
        threshold=2000.0, max_hops=8,
    )
    # complete heights, ascending order — the CDC replay batch contract
    hs = sorted(r.height for r in sw.select("height").distinct().collect())
    splits = [hs[: len(hs) // 3], hs[len(hs) // 3 : 2 * len(hs) // 3], hs[2 * len(hs) // 3 :]]
    for b, chunk in enumerate(s for s in splits if s):
        inc.advance(sw.filter(F.col("height").isin(chunk)), b)
    return inc.price_rows().select(
        F.col("height").cast("long").alias("height"),
        "token",
        "method",
        F.round("price", 4).alias("price"),
    )


def q_sessionize(spark, sf_dir):
    """Batch sessionization (gap > 30 min starts a new session) — the
    batch analog of the streaming `session_window` re-crawl-storm
    grouping (`streaming/windowed.py`): lag over (user, ts) marks session
    starts, a running sum numbers them, then one grouped aggregate emits
    per-session stats. Two logical windows but ONE physical sort: both
    window functions share the (user_id, ts, event_id) ordering, so
    Catalyst plans a single exchange + sort. Timestamps are emitted as
    epoch seconds (integer-exact across engines)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    s = ev.withColumn("sess_no", F.sum(new_sess).over(w))
    return (
        s.groupBy("user_id", "sess_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.unix_timestamp(F.min("ts")).alias("start_s"),
            F.unix_timestamp(F.max("ts")).alias("end_s"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .withColumn("sess_no", F.col("sess_no").cast("long"))
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_no
  FROM g
)
SELECT user_id, CAST(sess_no AS BIGINT) AS sess_no,
       count(*) AS n_events,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS start_s,
       CAST(floor(epoch(max(ts))) AS BIGINT) AS end_s,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, sess_no
"""


_MIX_RATES = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.125}


def q_stratified_sample(spark, sf_dir):
    """Deterministic per-source downsampling (data mixing): each source
    gets a keep rate and a document survives iff its key-hash fraction is
    below its source's rate — a pure function of (doc_id, source), so the
    mix is reproducible across runs, partitionings and cluster sizes, and
    growing the corpus never resamples old rows. Zero shuffle until the
    per-source audit aggregate. Verified per-source with count + char
    checksum (covers every kept row). Unknown sources keep rate 1.0."""
    from cosmwasm_etl_spark.functions.sampling import split_frac

    docs = _t(spark, sf_dir, "documents")
    rate = None
    for src, r in _MIX_RATES.items():
        cond = F.col("source") == src
        rate = F.when(cond, F.lit(r)) if rate is None else rate.when(cond, F.lit(r))
    rate = rate.otherwise(F.lit(1.0))
    kept = docs.filter(split_frac(F.col("doc_id"), hash_family="lcg") < rate)
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_kept"), F.sum("n_chars").alias("sum_chars")
    )


def _sql_stratified_sample() -> str:
    from cosmwasm_etl_spark.functions.sampling import lcg_sql_expr

    cases = " ".join(f"WHEN '{s}' THEN {r!r}" for s, r in _MIX_RATES.items())
    return f"""
SELECT source, count(*) AS n_kept, CAST(sum(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {lcg_sql_expr('doc_id')} < (CASE source {cases} ELSE 1.0 END)
GROUP BY source
"""


SQL_STRATIFIED_SAMPLE = _sql_stratified_sample()


def q_cdc_changelog(spark, sf_dir):
    """CDC read side: insert/update/delete changelog between two snapshot
    times (the lake change-data-feed contract), computed in ONE scan and
    ONE shuffle — a single groupBy(key) with two conditional max_by
    winners, no self-join. Latest event_type='error' plays the tombstone
    (latest-wins + tombstone = the pipeline's delete semantics)."""
    from cosmwasm_etl_spark.operators.changelog import snapshot_diff

    ev = _t(spark, sf_dir, "events")
    out = snapshot_diff(
        ev,
        key="user_id",
        order_cols=["event_id"],
        t1=F.lit("2024-01-15 00:00:00").cast("timestamp"),
        t2=F.lit("2024-01-31 00:00:00").cast("timestamp"),
        value_cols=["event_type", "value"],
        tombstone=F.col("event_type") == "error",
    )
    return out.select(
        "user_id",
        "change_type",
        "old_event_id",
        "new_event_id",
        "old_event_type",
        "new_event_type",
        F.round("old_value", 4).alias("old_value"),
        F.round("new_value", 4).alias("new_value"),
    )


SQL_CDC_CHANGELOG = """
WITH r1 AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events WHERE ts <= TIMESTAMP '2024-01-15 00:00:00'
), r2 AS (
  SELECT user_id, event_id, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events WHERE ts <= TIMESTAMP '2024-01-31 00:00:00'
), p1 AS (
  SELECT * FROM r1 WHERE rn = 1 AND event_type <> 'error'
), p2 AS (
  SELECT * FROM r2 WHERE rn = 1 AND event_type <> 'error'
), d AS (
  SELECT coalesce(p1.user_id, p2.user_id) AS user_id,
         CASE WHEN p1.user_id IS NULL THEN 'insert'
              WHEN p2.user_id IS NULL THEN 'delete'
              WHEN p1.event_id <> p2.event_id THEN 'update' END AS change_type,
         p1.event_id AS old_event_id, p2.event_id AS new_event_id,
         p1.event_type AS old_event_type, p2.event_type AS new_event_type,
         round(p1.value, 4) AS old_value, round(p2.value, 4) AS new_value
  FROM p1 FULL OUTER JOIN p2 ON p1.user_id = p2.user_id
)
SELECT * FROM d WHERE change_type IS NOT NULL
"""


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination (training-data op): every 97th document
    plays the held-out eval set; the rest of the corpus is scored by how
    many distinct word 5-grams it shares with that set, and gated at
    >= 3 shared shingles. Corpus never shuffles (benchmark shingle set is
    broadcast; the one exchange carries only overlap hits)."""
    from cosmwasm_etl_spark.functions.dedup import benchmark_overlap

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 11 == 0)
    corpus = docs.filter(F.col("doc_id") % 11 != 0)
    return benchmark_overlap(corpus, bench, n=4, min_overlap=2)


SQL_DECONTAMINATE = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) t
  FROM documents
), b AS (
  SELECT DISTINCT unnest([array_to_string(t[i:i+3], ' ')
                          for i in generate_series(1, len(t) - 3)]) AS s
  FROM toks WHERE doc_id % 11 = 0 AND len(t) >= 4
), c AS (
  SELECT doc_id, unnest(list_distinct([array_to_string(t[i:i+3], ' ')
                                       for i in generate_series(1, len(t) - 3)])) AS s
  FROM toks WHERE doc_id % 11 <> 0 AND len(t) >= 4
), hits AS (
  SELECT c.doc_id, count(*) AS n FROM c JOIN b ON c.s = b.s GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.n, 0) AS BIGINT) AS n_overlap,
       coalesce(h.n, 0) >= 2 AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % 11 <> 0
"""


def _url_synth(doc_id):
    """Five deterministic messy spellings per document group — exercises
    every canonicalization rule (case, default vs explicit ports, tracking
    params, param order, fragments, trailing slashes). The oracle builds
    the SAME strings and canonicalizes them with its own SQL twin."""
    k = F.expr("doc_id div 5").cast("string")
    m = doc_id % 5
    did = doc_id.cast("string")
    # host varies with the GROUP key (not per-doc), so the five spellings
    # of one group really collide after canonicalization
    source = F.concat(F.lit("site"), F.expr("(doc_id div 5) % 37").cast("string"))
    return (
        F.when(m == 0, F.concat(F.lit("http://WWW."), source, F.lit(".example.com/articles/"), k, F.lit("/?utm_source=feed&b=2&a=1")))
        .when(m == 1, F.concat(F.lit("HTTP://www."), source, F.lit(".EXAMPLE.COM:80/articles/"), k, F.lit("?a=1&b=2&fbclid=x"), did))
        .when(m == 2, F.concat(F.lit("https://"), source, F.lit(".example.com:443/articles/"), k, F.lit("?b=2&a=1#frag")))
        .when(m == 3, F.concat(F.lit("http://www."), source, F.lit(".example.com/articles/"), k, F.lit("/?b=2&a=1#section-"), did))
        .otherwise(F.concat(F.lit("http://www."), source, F.lit(".example.com:8080/articles/"), k, F.lit("?a=1&b=2&gclid="), did))
    )


_URL_SYNTH_SQL = """
CASE CAST(doc_id % 5 AS INT)
  WHEN 0 THEN 'http://WWW.' || ('site' || CAST((doc_id // 5) % 37 AS VARCHAR)) || '.example.com/articles/' || CAST(doc_id // 5 AS VARCHAR) || '/?utm_source=feed&b=2&a=1'
  WHEN 1 THEN 'HTTP://www.' || ('site' || CAST((doc_id // 5) % 37 AS VARCHAR)) || '.EXAMPLE.COM:80/articles/' || CAST(doc_id // 5 AS VARCHAR) || '?a=1&b=2&fbclid=x' || CAST(doc_id AS VARCHAR)
  WHEN 2 THEN 'https://' || ('site' || CAST((doc_id // 5) % 37 AS VARCHAR)) || '.example.com:443/articles/' || CAST(doc_id // 5 AS VARCHAR) || '?b=2&a=1#frag'
  WHEN 3 THEN 'http://www.' || ('site' || CAST((doc_id // 5) % 37 AS VARCHAR)) || '.example.com/articles/' || CAST(doc_id // 5 AS VARCHAR) || '/?b=2&a=1#section-' || CAST(doc_id AS VARCHAR)
  ELSE 'http://www.' || ('site' || CAST((doc_id // 5) % 37 AS VARCHAR)) || '.example.com:8080/articles/' || CAST(doc_id // 5 AS VARCHAR) || '?a=1&b=2&gclid=' || CAST(doc_id AS VARCHAR)
END
"""


def q_url_canonical_dedup(spark, sf_dir):
    """URL canonicalization + canonical-key dedup (webtext CDC surface).

    The input-table hint keys pages by ``url``; re-crawls arrive under
    many spellings of the same address, and canonicalizing BEFORE the
    latest-wins dedup is what keeps one page one CDC key. The testdata
    tables carry no url column, so both sides synthesize the same messy
    spellings deterministically from ``documents`` and canonicalize with
    their OWN implementation (Spark Column ops vs the DuckDB SQL twin) —
    the driver verifies the full rule set value-for-value.

    Plan shape: canonicalization is a pure projection (zero shuffle,
    whole-stage codegen); the dedup is one map-side-combining hash
    aggregate — the same shape as the pipeline's latest-wins dedup, so it
    holds at 10^10 rows.
    """
    from cosmwasm_etl_spark.functions.urls import canonicalize_url, host_of

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        F.col("doc_id"), _url_synth(F.col("doc_id")).alias("url")
    )
    c = t.select(
        "doc_id",
        canonicalize_url(F.col("url")).alias("canonical_url"),
        host_of(F.col("url")).alias("host"),
    )
    return c.groupBy("canonical_url").agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_doc_id"),
        F.min("host").alias("host"),
    )


def _sql_url_canonical_dedup() -> str:
    from cosmwasm_etl_spark.functions.urls import canonical_url_sql_expr, host_sql_expr

    return f"""
WITH u AS (
  SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents
), c AS (
  SELECT doc_id, {canonical_url_sql_expr('url')} AS canonical_url,
         {host_sql_expr('url')} AS host
  FROM u
)
SELECT canonical_url, count(*) AS n_docs, min(doc_id) AS min_doc_id, min(host) AS host
FROM c GROUP BY canonical_url
"""


SQL_URL_CANONICAL_DEDUP = _sql_url_canonical_dedup()


def _pii_synth(doc_id):
    """Deterministic PII footer per document (the fixture text carries no
    PII, so both sides plant the same strings — the oracle then verifies
    the redaction regexes value-for-value across dialects). One document
    in four stays clean as the no-op control."""
    did = doc_id.cast("string")
    m = doc_id % 4
    return (
        F.when(m == 0, F.concat(F.lit(" contact user"), did, F.lit("@example.org now")))
        .when(m == 1, F.concat(F.lit(" call +1-555-"), F.lpad((doc_id % 10000).cast("string"), 4, "0"), F.lit(" today")))
        .when(m == 2, F.concat(
            F.lit(" server at 10."), (doc_id % 200).cast("string"),
            F.lit("."), (doc_id % 250).cast("string"),
            F.lit("."), ((doc_id * 7) % 250).cast("string"), F.lit(" responded")))
        .otherwise(F.lit(""))
    )


_PII_SYNTH_SQL = """
CASE CAST(doc_id % 4 AS INT)
  WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.org now'
  WHEN 1 THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' today'
  WHEN 2 THEN ' server at 10.' || CAST(doc_id % 200 AS VARCHAR) || '.' || CAST(doc_id % 250 AS VARCHAR) || '.' || CAST((doc_id * 7) % 250 AS VARCHAR) || ' responded'
  ELSE ''
END
"""


def q_pii_redact(spark, sf_dir):
    """PII redaction (training-data op): scrub emails / phones / IPv4s to
    typed placeholder tokens, plus per-kind match counts.

    Plan shape: a pure projection — regexp_replace/regexp_count run inside
    whole-stage codegen, zero shuffle, one scan at any corpus size. The
    md5 of the redacted text makes the oracle byte-exact per row.
    """
    from cosmwasm_etl_spark.functions.redaction import pii_counts, redact_pii

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.concat(F.col("text"), _pii_synth(F.col("doc_id"))).alias("pii_text")
    )
    counts = pii_counts(F.col("pii_text"))
    return t.select(
        "doc_id",
        counts["emails"],
        counts["phones"],
        counts["ips"],
        F.md5(redact_pii(F.col("pii_text"))).alias("clean_md5"),
    )


def _sql_pii_redact() -> str:
    from cosmwasm_etl_spark.functions.redaction import pii_counts_sql, redact_pii_sql

    c = pii_counts_sql("pii_text")
    return f"""
WITH t AS (
  SELECT doc_id, text || {_PII_SYNTH_SQL} AS pii_text FROM documents
)
SELECT doc_id,
       {c['emails']} AS n_emails,
       {c['phones']} AS n_phones,
       {c['ips']} AS n_ips,
       md5({redact_pii_sql('pii_text')}) AS clean_md5
FROM t
"""


SQL_PII_REDACT = _sql_pii_redact()


_PACK_BUDGET = 1000


def q_pack_docs(spark, sf_dir):
    """Greedy sequence packing: first-fit-in-order bin assignment per
    source under a fixed character budget (see operators/packing.py for
    the recurrence and the 10^10-doc parallelization story). The oracle
    replays the identical recurrence as a DuckDB recursive CTE, so every
    bin assignment and running fill is verified."""
    from cosmwasm_etl_spark.operators.packing import pack_documents

    docs = _t(spark, sf_dir, "documents")
    return pack_documents(
        docs, cost_col="n_chars", budget=_PACK_BUDGET,
        group_col="source", order_col="doc_id",
    )


SQL_PACK_DOCS = f"""
WITH RECURSIVE ordered AS (
  SELECT source, doc_id, n_chars,
         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents
), pack AS (
  SELECT source, doc_id, rn,
         0::BIGINT AS bin_id, CAST(n_chars AS BIGINT) AS bin_fill
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.source, o.doc_id, o.rn,
         CASE WHEN p.bin_fill + o.n_chars > {_PACK_BUDGET} THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + o.n_chars > {_PACK_BUDGET} THEN CAST(o.n_chars AS BIGINT) ELSE p.bin_fill + o.n_chars END
  FROM pack p JOIN ordered o ON o.source = p.source AND o.rn = p.rn + 1
)
SELECT CAST(doc_id AS BIGINT) AS doc_id, source, bin_id, bin_fill FROM pack
"""


def q_segment_dedup(spark, sf_dir):
    """Corpus-level segment (paragraph) dedup, CCNet-style: a segment
    survives iff it is the corpus-wide first occurrence of its content.
    Reported per document with an md5 of the kept text so the oracle
    checks every keep/drop decision (see functions/dedup.py)."""
    from cosmwasm_etl_spark.functions.dedup import segment_dedup_stats

    docs = _t(spark, sf_dir, "documents")
    return segment_dedup_stats(docs, text_col="text", id_col="doc_id", seg_tokens=8)


SQL_SEGMENT_DEDUP = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) AS toks
  FROM documents
), s AS (
  SELECT doc_id,
         unnest(list_transform(range(CAST(ceil(len(toks) / 8.0) AS INT)),
                               i -> array_to_string(toks[i*8+1 : i*8+8], ' '))) AS seg,
         unnest(range(CAST(ceil(len(toks) / 8.0) AS INT))) AS pos
  FROM t
), flagged AS (
  SELECT doc_id, pos, seg,
         row_number() OVER (PARTITION BY seg ORDER BY doc_id, pos) = 1 AS kept
  FROM s
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_segs,
       CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept,
       md5(coalesce(string_agg(seg, ' ' ORDER BY pos) FILTER (WHERE kept), '')) AS kept_md5
FROM flagged GROUP BY doc_id
"""


def q_substring_span_dups(spark, sf_dir):
    """Exact duplicated-substring spans (Lee et al. 2022 exact substring
    dedup, bucket-then-verify instead of suffix arrays): per document, the
    count and merged token coverage of k-token windows whose exact token
    sequence occurs more than once in the corpus (see
    functions/dedup.py:substring_span_stats for the scale shape)."""
    from cosmwasm_etl_spark.functions.dedup import substring_span_stats

    docs = _t(spark, sf_dir, "documents")
    return substring_span_stats(docs, text_col="text", id_col="doc_id", k=8)


SQL_SUBSTRING_SPAN_DUPS = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(trim(text)), '{_TOK_SPLIT_SQL}'), x -> len(x) > 0) AS toks
  FROM documents
), w AS (
  SELECT doc_id,
         unnest(range(greatest(len(toks) - 7, 0))) AS pos,
         unnest(list_transform(range(greatest(len(toks) - 7, 0)),
                               i -> array_to_string(toks[i+1 : i+8], ' '))) AS sub
  FROM t
), flagged AS (
  SELECT doc_id, pos, count(*) OVER (PARTITION BY sub) > 1 AS dup FROM w
), d AS (
  SELECT doc_id, pos FROM flagged WHERE dup
), isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos > coalesce(max(pos + 8) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM d
), g AS (
  SELECT doc_id, pos,
         sum(new_isl) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
  FROM isl
), spans AS (
  SELECT doc_id, gid, min(pos) AS s, max(pos) + 8 AS e FROM g GROUP BY doc_id, gid
), per_doc AS (
  SELECT doc_id, count(*) AS n_dup_spans, sum(e - s) AS dup_tokens FROM spans GROUP BY doc_id
), nw AS (
  SELECT doc_id, count(*) AS n_windows FROM w GROUP BY doc_id
), ndw AS (
  SELECT doc_id, count(*) AS n_dup_windows FROM d GROUP BY doc_id
)
SELECT d0.doc_id,
       CAST(coalesce(nw.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(ndw.n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
       CAST(coalesce(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
       CAST(coalesce(p.dup_tokens, 0) AS BIGINT) AS dup_tokens
FROM documents d0
LEFT JOIN nw USING (doc_id)
LEFT JOIN ndw USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
"""


_BLOCKED_HOSTS = ["www.site1.example.com", "www.site7.example.com", "site13.example.com"]


def q_domain_stats(spark, sf_dir):
    """Domain-level corpus stats behind a blocklist filter: parse the host
    from each page URL, drop blocklisted domains with a broadcast
    left-anti join (blocklists are small dims — never shuffle the corpus
    for one), aggregate per surviving domain."""
    from cosmwasm_etl_spark.functions.urls import host_of

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "n_chars", host_of(_url_synth(F.col("doc_id"))).alias("host")
    )
    block = spark.createDataFrame([(h,) for h in _BLOCKED_HOSTS], ["host"])
    kept = t.join(F.broadcast(block), "host", "left_anti")
    return kept.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("sum_chars"),
        F.min("doc_id").alias("min_doc_id"),
    )


def _sql_domain_stats() -> str:
    from cosmwasm_etl_spark.functions.urls import host_sql_expr

    blocked = ", ".join(f"'{h}'" for h in _BLOCKED_HOSTS)
    return f"""
WITH u AS (
  SELECT doc_id, n_chars, {_URL_SYNTH_SQL} AS url FROM documents
), h AS (
  SELECT doc_id, n_chars, {host_sql_expr('url')} AS host FROM u
)
SELECT host, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, min(doc_id) AS min_doc_id
FROM h WHERE host NOT IN ({blocked}) GROUP BY host
"""


SQL_DOMAIN_STATS = _sql_domain_stats()


def q_resample_docs(spark, sf_dir):
    """Deterministic source-temperature resampling (corpus mixing):
    expected w copies per doc — floor(w) guaranteed plus a stochastically
    rounded extra, a pure function of (doc_id, seed). The per-source
    weight is derived from the source string so both engines compute it
    independently. Zero shuffle: weight + copy count are projections."""
    from cosmwasm_etl_spark.functions.sampling import resample_copies

    docs = _t(spark, sf_dir, "documents")
    wt = (
        (F.ascii(F.col("source").substr(F.length("source"), F.lit(1))) % 4).cast("double")
        + F.lit(0.25)
    )
    return docs.select(
        "doc_id",
        "source",
        resample_copies(F.col("doc_id"), wt, hash_family="lcg").alias("n_copies"),
    )


def _sql_resample_docs() -> str:
    from cosmwasm_etl_spark.functions.sampling import lcg_sql_expr

    return f"""
WITH w AS (
  SELECT doc_id, source,
         CAST(ascii(substr(source, length(source), 1)) % 4 AS DOUBLE) + 0.25 AS wt
  FROM documents
)
SELECT doc_id, source,
       CAST(floor(wt) AS BIGINT)
         + CASE WHEN {lcg_sql_expr('doc_id')} < wt - floor(wt) THEN 1 ELSE 0 END AS n_copies
FROM w
"""


SQL_RESAMPLE_DOCS = _sql_resample_docs()

_SHUFFLE_SHARDS = 64


def q_shuffle_order(spark, sf_dir):
    """Deterministic sharded training order. A single global sort of a
    10^10-doc corpus is a scale-killer; the standard shape hashes docs to
    shards and orders within shards (each shard an independent parallel
    unit; training order = shards concatenated in shard order). The
    window is partitioned by shard — no global exchange."""
    from pyspark.sql import Window

    from cosmwasm_etl_spark.functions.sampling import shard_order, split_frac

    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        split_frac(F.col("doc_id"), hash_family="lcg").alias("frac"),
    ).withColumn("shard", shard_order(F.col("doc_id"), _SHUFFLE_SHARDS, hash_family="lcg"))
    w = Window.partitionBy("shard").orderBy("frac", "doc_id")
    return t.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("shard_pos")
    )


def _sql_shuffle_order() -> str:
    from cosmwasm_etl_spark.functions.sampling import lcg_sql_expr

    frac = lcg_sql_expr("doc_id")
    return f"""
WITH t AS (
  SELECT doc_id, {frac} AS frac,
         CAST(least(floor({frac} * {_SHUFFLE_SHARDS}), {_SHUFFLE_SHARDS} - 1) AS INT) AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY frac, doc_id) AS BIGINT) AS shard_pos
FROM t
"""


SQL_SHUFFLE_ORDER = _sql_shuffle_order()


QUERIES = {
    "latest_per_key": q_latest_per_key,
    "first_event_per_key": q_first_event_per_key,
    "asof_join": q_asof_join,
    "windowed_stats_30m": q_windowed_stats_30m,
    "running_total": q_running_total,
    "group_top1": q_group_top1,
    "dedup_anti_join": q_dedup_anti_join,
    "full_outer_validation": q_full_outer_validation,
    "net_position": q_net_position,
    "lp_history": q_lp_history,
    "recent_stats_48h": q_recent_stats_48h,
    "pricing_summary": q_pricing_summary,
    "decimal_turnover": q_decimal_turnover,
    "decimal_turnover_wide": q_decimal_turnover_wide,
    "parts_revenue": q_parts_revenue,
    "semi_join_orders": q_semi_join_orders,
    "routes": q_routes,
    "price_series": q_price_series,
    "exact_dedup_docs": q_exact_dedup_docs,
    "url_canonical_dedup": q_url_canonical_dedup,
    "pii_redact": q_pii_redact,
    "pack_docs": q_pack_docs,
    "segment_dedup": q_segment_dedup,
    "substring_span_dups": q_substring_span_dups,
    "domain_stats": q_domain_stats,
    "resample_docs": q_resample_docs,
    "shuffle_order": q_shuffle_order,
    "decontaminate": q_decontaminate,
    "cdc_changelog": q_cdc_changelog,
    "cluster_retention": q_cluster_retention,
    "sessionize": q_sessionize,
    "stratified_sample": q_stratified_sample,
    "doc_token_stats": q_doc_token_stats,
    "lang_id_docs": q_lang_id_docs,
    "gopher_quality": q_gopher_quality,
    "ngram_lm_score": q_ngram_lm_score,
    "dataset_split": q_dataset_split,
    "doc_length_quantiles": q_doc_length_quantiles,
    "tfidf_top_terms": q_tfidf_top_terms,
    "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
    "dedup_clusters": q_dedup_clusters,
    "minhash_lsh_dups": q_minhash_lsh_dups,
    "simhash_dups": q_simhash_dups,
    "cosine_topk": q_cosine_topk,
    "embedding_near_dups": q_embedding_near_dups,
    "lsh_ann": q_lsh_ann,
    "ivf_ann": q_ivf_ann,
    "multimodal_features": q_multimodal_features,
    "pair_stats_30m_incr": q_pair_stats_30m_incr,
    "account_stats_incr": q_account_stats_incr,
    "price_series_incr": q_price_series_incr,
}

ORACLES = {
    "latest_per_key": SQL_LATEST_PER_KEY,
    "first_event_per_key": SQL_FIRST_EVENT_PER_KEY,
    "asof_join": SQL_ASOF_JOIN,
    "windowed_stats_30m": SQL_WINDOWED_STATS_30M,
    "running_total": SQL_RUNNING_TOTAL,
    "group_top1": SQL_GROUP_TOP1,
    "dedup_anti_join": SQL_DEDUP_ANTI_JOIN,
    "full_outer_validation": SQL_FULL_OUTER_VALIDATION,
    "net_position": SQL_NET_POSITION,
    "lp_history": SQL_LP_HISTORY,
    "recent_stats_48h": SQL_RECENT_STATS_48H,
    "pricing_summary": SQL_PRICING_SUMMARY,
    "decimal_turnover": SQL_DECIMAL_TURNOVER,
    "decimal_turnover_wide": SQL_DECIMAL_TURNOVER_WIDE,
    "parts_revenue": SQL_PARTS_REVENUE,
    "semi_join_orders": SQL_SEMI_JOIN_ORDERS,
    "routes": SQL_ROUTES,
    "price_series": SQL_PRICE_SERIES,
    "exact_dedup_docs": SQL_EXACT_DEDUP_DOCS,
    "url_canonical_dedup": SQL_URL_CANONICAL_DEDUP,
    "pii_redact": SQL_PII_REDACT,
    "pack_docs": SQL_PACK_DOCS,
    "segment_dedup": SQL_SEGMENT_DEDUP,
    "substring_span_dups": SQL_SUBSTRING_SPAN_DUPS,
    "domain_stats": SQL_DOMAIN_STATS,
    "resample_docs": SQL_RESAMPLE_DOCS,
    "shuffle_order": SQL_SHUFFLE_ORDER,
    "decontaminate": SQL_DECONTAMINATE,
    "cdc_changelog": SQL_CDC_CHANGELOG,
    "cluster_retention": SQL_CLUSTER_RETENTION,
    "sessionize": SQL_SESSIONIZE,
    "stratified_sample": SQL_STRATIFIED_SAMPLE,
    "doc_token_stats": SQL_DOC_TOKEN_STATS,
    "lang_id_docs": SQL_LANG_ID_DOCS,
    "gopher_quality": SQL_GOPHER_QUALITY,
    "ngram_lm_score": SQL_NGRAM_LM_SCORE,
    "dataset_split": SQL_DATASET_SPLIT,
    "doc_length_quantiles": SQL_DOC_LENGTH_QUANTILES,
    "tfidf_top_terms": SQL_TFIDF_TOP_TERMS,
    "ngram_jaccard_pairs": SQL_NGRAM_JACCARD_PAIRS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "cosine_topk": SQL_COSINE_TOPK,
    "embedding_near_dups": SQL_EMBEDDING_NEAR_DUPS,
    # multimodal_features is added lazily by build_oracles() — its SQL
    # embeds the media fixture path, which must be created first.
    # the incremental jobs share the one-shot oracles: incremental ==
    # one-shot is exactly the claim being driver-verified
    "pair_stats_30m_incr": SQL_WINDOWED_STATS_30M,
    "account_stats_incr": SQL_NET_POSITION,
    "price_series_incr": SQL_PRICE_SERIES,
    # minhash_lsh_dups / simhash_dups / lsh_ann are hash-seed-dependent:
    # their oracles are expected-output parquet fixtures precomputed by the
    # independent pure-Python XXH64 reference pipeline — added lazily by
    # build_oracles() because the SQL embeds the fixture path.
}

# Every query has an oracle; the lazily-built ones are listed here so test
# parametrization can know the full key set without paying fixture
# materialization at collection time.
LAZY_ORACLE_NAMES = ("multimodal_features", "minhash_lsh_dups", "simhash_dups", "lsh_ann", "ivf_ann")
ORACLE_NAMES = tuple(sorted(set(ORACLES) | set(LAZY_ORACLE_NAMES)))

# Default sf dir for the driver's correctness comparison (the driver runs
# queries() and oracle_sql() side-by-side at sf0.01; overridable for local
# runs at another scale).
_ORACLE_SF_DIR_DEFAULT = "/root/testdata/sf0.01"


def build_oracles(sf_dir: str | None = None) -> dict[str, str]:
    """The full oracle map, including entries whose SQL must be built lazily
    (fixture-path-embedding ones). ``sf_dir`` is the scale the queries will
    run at — it must match the driver's correctness sf (default sf0.01)
    because the hash-seeded expected fixtures are input-dependent."""
    import os as _os

    from cosmwasm_etl_spark.functions.pyoracle import ensure_expected_fixture

    sf = sf_dir or _os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", _ORACLE_SF_DIR_DEFAULT)
    d = dict(ORACLES)
    d["multimodal_features"] = _sql_multimodal_features()
    d["minhash_lsh_dups"] = (
        f"SELECT id_a, id_b, jaccard FROM read_parquet('{ensure_expected_fixture('minhash_lsh_dups', sf)}')"
    )
    d["simhash_dups"] = (
        f"SELECT id_a, id_b, hamming FROM read_parquet('{ensure_expected_fixture('simhash_dups', sf)}')"
    )
    d["lsh_ann"] = (
        f"SELECT query_id, neighbor_id, cosine, rank FROM read_parquet('{ensure_expected_fixture('lsh_ann', sf)}')"
    )
    d["ivf_ann"] = (
        f"SELECT query_id, neighbor_id, cosine, rank FROM read_parquet('{ensure_expected_fixture('ivf_ann', sf)}')"
    )
    return d
