"""As-of (point-in-time) join — J3/J4 in SURVEY.md §2.3.

Parity anchor: the reference's ``LEFT JOIN LATERAL (SELECT price ... WHERE
height <= pt.height ORDER BY height DESC LIMIT 1)``
(`/root/reference/pkg/db/parser/repository.go:321-325,485-504`) and the
Go-side linear scan ``searchPrice`` (`/root/reference/aggregator/task.go:558-578`).

Spark has no lateral-limit-1 join; the scale-correct shape is the
union + ``last(value, ignorenulls) OVER (partition by key ORDER BY ts ...)``
sweep: one shuffle on the join key, one per-key sort, zero row explosion —
versus a naive range join which is O(left × right-per-key). Ties (left.ts ==
right.ts) take the right row (at-or-before is inclusive), matching the
reference's ``<=``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    suffix: str = "",
    right_seq: str | None = None,
) -> DataFrame:
    """For each left row, attach the latest right ``value_cols`` with
    ``right_ts <= left_ts`` (per ``on`` key). NULL when no prior right row.

    Both inputs are unioned with a side tag; at equal timestamps the right
    row sorts first so ``last(..., ignorenulls=True)`` sees it. When the
    right side can contain duplicate timestamps per key, pass ``right_seq``
    (e.g. an event id) — the greatest (ts, seq) right row wins, matching the
    reference's ``ORDER BY height DESC, id DESC LIMIT 1``.
    """
    lcols = left.columns
    tagged_l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__seq"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__v_{c}") for c in value_cols],
    )
    tagged_r = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c not in on else F.col(c) for c in lcols],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        (F.col(right_seq).cast("long") if right_seq else F.lit(0).cast("long")).alias("__seq"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    u = tagged_l.unionByName(tagged_r)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__side").desc(), F.col("__seq").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        *[c for c in lcols],
        F.col("__side"),
        *[
            F.last(F.col(f"__v_{c}"), ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    return filled.filter(F.col("__side") == 0).drop("__side")
