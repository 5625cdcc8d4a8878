"""Snapshot-diff changelog: the CDC *read* side.

The pipeline applies change events into a latest-wins table (write side);
this operator answers the inverse question — "what changed between two
points in time?" — producing an insert/update/delete changelog between
two snapshot times from the raw event stream, the same contract as a
lake-format change-data-feed read (Delta ``table_changes`` / Iceberg
``changelog`` scans, public APIs).

Reference parity: the reference's validation jobs diff two materialized
states row-by-row (aggregator/srcDataValidator, SURVEY §2 J6); this
operator generalizes that to a keyed three-way classification at two
arbitrary watermarks without materializing either state.

Physical shape — the part that matters at 10^10 events: both snapshots
are computed in ONE scan and ONE shuffle, as a single groupBy(key) with
two *conditional* ``max_by`` aggregates (``ordering`` NULLed out for
events past each watermark; max_by skips NULL orderings in both Spark
and the DuckDB oracle). No self-join, no second pass; map-side partial
aggregation collapses hot keys before the exchange exactly like the
pipeline's latest-wins dedup.

Tombstone convention: ``tombstone`` is a boolean Column over the event
row; a key whose winning event is a tombstone is ABSENT from that
snapshot (latest-wins + tombstone = the pipeline's delete semantics,
``plans/pipeline.py`` apply_batch).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    events: DataFrame,
    key: str,
    order_cols: list[str],
    t1: Column,
    t2: Column,
    ts_col: str = "ts",
    value_cols: list[str] | None = None,
    tombstone: Column | None = None,
) -> DataFrame:
    """Changelog rows (key, change_type, old/new winner columns) between
    the states as-of ``t1`` and as-of ``t2`` (inclusive).

    ``change_type`` ∈ {'insert','update','delete'}; keys whose winning
    row is identical at both times are not emitted. 'update' means the
    winning event changed (row version moved), whether or not any value
    column changed — the CDC row-version contract.
    """
    value_cols = value_cols or []
    ts = F.col(ts_col)
    tomb = tombstone if tombstone is not None else F.lit(False)
    payload = F.struct(
        *[F.col(c).alias(c) for c in dict.fromkeys([*order_cols, *value_cols])],
        tomb.alias("__tomb"),
    )
    ordering = F.struct(ts.alias("__ts"), *[F.col(c).alias(c) for c in order_cols])

    def winner(bound: Column) -> Column:
        cond = ts <= bound
        return F.max_by(F.when(cond, payload), F.when(cond, ordering))

    g = events.groupBy(key).agg(
        winner(t1).alias("w1"), winner(t2).alias("w2")
    )
    present1 = F.col("w1").isNotNull() & ~F.col("w1")["__tomb"]
    present2 = F.col("w2").isNotNull() & ~F.col("w2")["__tomb"]
    same = F.struct(*[F.col("w1")[c] for c in order_cols]).eqNullSafe(
        F.struct(*[F.col("w2")[c] for c in order_cols])
    )
    change = (
        F.when(present2 & ~present1, F.lit("insert"))
        .when(present1 & ~present2, F.lit("delete"))
        .when(present1 & present2 & ~same, F.lit("update"))
    )
    out_cols = [F.col(key), change.alias("change_type")]
    for c in order_cols + value_cols:
        out_cols.append(F.when(present1, F.col("w1")[c]).alias(f"old_{c}"))
        out_cols.append(F.when(present2, F.col("w2")[c]).alias(f"new_{c}"))
    return g.select(*out_cols).filter(F.col("change_type").isNotNull())
