"""Snapshot-diff changelog: classification semantics on a planted event
history, and the single-scan/single-exchange plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from cosmwasm_etl_spark.operators.changelog import snapshot_diff


def _ts(day: int) -> dt.datetime:
    return dt.datetime(2024, 1, day)


def _diff(spark, rows, t1_day: int, t2_day: int):
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "ts", "event_type", "value"])
    out = snapshot_diff(
        ev,
        key="user_id",
        order_cols=["event_id"],
        t1=F.lit(_ts(t1_day)),
        t2=F.lit(_ts(t2_day)),
        value_cols=["event_type", "value"],
        tombstone=F.col("event_type") == "delete",
    )
    return {r["user_id"]: r.asDict() for r in out.collect()}


def test_changelog_classifies_insert_update_delete(spark):
    rows = [
        # u1: exists before t1, new winner between t1 and t2 -> update
        (1, 10, _ts(5), "set", 1.0),
        (1, 11, _ts(20), "set", 2.0),
        # u2: first event after t1 -> insert
        (2, 20, _ts(20), "set", 5.0),
        # u3: live at t1, tombstoned before t2 -> delete
        (3, 30, _ts(5), "set", 7.0),
        (3, 31, _ts(20), "delete", 0.0),
        # u4: unchanged winner -> NOT emitted
        (4, 40, _ts(5), "set", 9.0),
        # u5: tombstoned at BOTH times (absent -> absent) -> NOT emitted
        (5, 50, _ts(4), "delete", 0.0),
        (5, 51, _ts(20), "delete", 0.0),
        # u6: inserted after t1 then tombstoned before t2 -> NOT emitted
        (6, 60, _ts(16), "set", 3.0),
        (6, 61, _ts(22), "delete", 0.0),
    ]
    got = _diff(spark, rows, t1_day=15, t2_day=31)
    assert set(got) == {1, 2, 3}
    assert got[1]["change_type"] == "update"
    assert (got[1]["old_event_id"], got[1]["new_event_id"]) == (10, 11)
    assert (got[1]["old_value"], got[1]["new_value"]) == (1.0, 2.0)
    assert got[2]["change_type"] == "insert"
    assert got[2]["old_event_id"] is None and got[2]["new_event_id"] == 20
    assert got[3]["change_type"] == "delete"
    assert got[3]["old_event_id"] == 30 and got[3]["new_event_id"] is None


def test_changelog_same_ts_tiebreak_by_order_col(spark):
    # two events with the SAME timestamp: the higher event_id wins, and a
    # winner flip purely on the tiebreak column still classifies as update
    rows = [
        (7, 70, _ts(5), "set", 1.0),
        (7, 72, _ts(20), "set", 2.0),
        (7, 71, _ts(20), "set", 3.0),
    ]
    got = _diff(spark, rows, t1_day=15, t2_day=31)
    assert got[7]["change_type"] == "update"
    assert got[7]["new_event_id"] == 72 and got[7]["new_value"] == 2.0


def test_changelog_plan_single_scan_single_exchange(spark, sf_dir):
    """Both snapshots must come from ONE scan and ONE hash-partitioning
    exchange with map-side partial aggregation — no self-join, no second
    scan of the event log."""
    from cosmwasm_etl_spark.queries import q_cdc_changelog

    df = q_cdc_changelog(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert plan.lower().count("scan parquet") == 1, plan
    assert "partial_max_by" in plan.lower().replace("_maxby", "_max_by"), plan
