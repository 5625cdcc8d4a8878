"""Rank-matched anti-join with multiset semantics — J8 in SURVEY.md §2.3.

Parity anchor: ``RemoveDuplicatedTxs`` (`/root/reference/parser/dex/dex.go:734-792`)
removes, for each matching right-side row, exactly ONE left-side occurrence
(1:1 consume) — a plain ``left_anti`` would remove ALL occurrences of a
duplicated tuple. The multiset semantics are recovered by numbering
occurrences on both sides within the match key and anti-joining on
``key + occurrence_rank``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def multiset_anti_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_order: list[str],
    right_order: list[str] | None = None,
) -> DataFrame:
    """left MINUS ALL right on ``keys``: each right row cancels one left row.

    ``left_order``/``right_order`` make the occurrence numbering
    deterministic (the reference consumes in slice order; Spark needs an
    explicit sort key).
    """
    right_order = right_order or [c for c in left_order if c in right.columns] or keys
    wl = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in left_order])
    wr = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in right_order])
    ln = left.withColumn("__occ", F.row_number().over(wl))
    rn = right.select(*keys, F.row_number().over(wr).alias("__occ"))
    return ln.join(rn, [*keys, "__occ"], "left_anti").drop("__occ")
