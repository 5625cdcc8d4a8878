"""Top-1 / first-per-key operators — J12, W1-W3 in SURVEY.md.

Parity anchors: group-max self-join (`/root/reference/aggregator/repo/repository.go:104-116`),
``DISTINCT ON (sender) ... ORDER BY sender, timestamp ASC``
(`/root/reference/pkg/db/parser/repository.go:711-720`),
``first_value(...) over (partition by pair_id order by height desc)``
(`/root/reference/pkg/db/parser/repository.go:302,350`).

Physical choice: ``max_by``/``min_by`` hash aggregates (map-side combine,
skew-proof) instead of the literal window/self-join shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def top1_per_key(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Row with the greatest (order_cols) per key group — J12/W1/W2."""
    out = df.columns
    row = F.struct(*[F.col(c) for c in out])
    order = F.struct(*[F.col(c) for c in order_cols])
    agg = df.groupBy(*keys).agg(F.max_by(row, order).alias("__r"))
    return agg.select(*[F.col(f"__r.{c}").alias(c) for c in out])


def first_per_key(df: DataFrame, keys: list[str], order_cols: list[str]) -> DataFrame:
    """Row with the smallest (order_cols) per key group — W3 first-event."""
    out = df.columns
    row = F.struct(*[F.col(c) for c in out])
    order = F.struct(*[F.col(c) for c in order_cols])
    agg = df.groupBy(*keys).agg(F.min_by(row, order).alias("__r"))
    return agg.select(*[F.col(f"__r.{c}").alias(c) for c in out])
