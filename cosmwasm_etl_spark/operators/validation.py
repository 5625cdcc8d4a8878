"""Full-outer state diff with mismatch classification — J6 + T9.

Parity anchor: the reference's pool validation (`/root/reference/parser/dex/dex.go:537-602`)
compares an expected-state map against actual rows; rows missing on either
side or differing in value are mismatches. Used by the engine's
replay-equivalence audit (recompute latest-wins from the log, diff against
the lakehouse table — the T9 "validation worker" analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def full_outer_diff(
    expected: DataFrame,
    actual: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Returns rows ``keys... , mismatch ∈ {missing_in_actual,
    missing_in_expected, value_mismatch}`` — empty DataFrame ⇔ states equal.

    NULL-safe equality (``<=>``) on compare columns.
    """
    compare_cols = compare_cols or [c for c in expected.columns if c not in keys]
    e = expected.alias("e")
    a = actual.alias("a")
    cond = [F.col(f"e.{k}") == F.col(f"a.{k}") for k in keys]
    j = e.join(a, cond, "full_outer")
    e_present = F.col(f"e.{keys[0]}").isNotNull()
    a_present = F.col(f"a.{keys[0]}").isNotNull()
    values_equal = F.lit(True)
    for c in compare_cols:
        values_equal = values_equal & F.col(f"e.{c}").eqNullSafe(F.col(f"a.{c}"))
    cls = (
        F.when(~a_present, F.lit("missing_in_actual"))
        .when(~e_present, F.lit("missing_in_expected"))
        .when(~values_equal, F.lit("value_mismatch"))
    )
    out_keys = [F.coalesce(F.col(f"e.{k}"), F.col(f"a.{k}")).alias(k) for k in keys]
    return j.select(*out_keys, cls.alias("mismatch")).filter(F.col("mismatch").isNotNull())
