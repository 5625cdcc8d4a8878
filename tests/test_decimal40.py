"""Exact 40-digit hi/lo decimal aggregation (functions/decimal40.py) —
parity against Python arbitrary-precision integers, carry edge cases,
malformed-input accounting."""

from __future__ import annotations

from decimal import Decimal, localcontext

from pyspark.sql import Row
from pyspark.sql import functions as F

from cosmwasm_etl_spark.functions.decimal40 import exact_wide_sum, wide_decimal_parts


def _py_sum(strs):
    with localcontext() as ctx:
        ctx.prec = 100  # default 28-digit context would ROUND 40-digit inputs
        total = sum(int(Decimal(s).scaleb(18)) for s in strs)
    return f"{total // 10**18}.{total % 10**18:018d}"


def test_wide_sum_matches_python_bigint(spark):
    amounts = [
        "1234567890123456789012.999999999999999999",  # 22-digit int part
        "9999999999999999999999.999999999999999999",  # max hi, carry-heavy lo
        "0.000000000000000001",
        "7",  # no fractional point
        "0.5",
        "123.456",
    ] * 7  # repetition forces multi-row carries
    df = spark.createDataFrame([Row(g="x", s=a) for a in amounts], "g string, s string")
    out = exact_wide_sum(df, ["g"], "s").collect()[0]
    assert out["n_bad"] == 0 and out["n_rows"] == len(amounts)
    assert out["sum_exact"] == _py_sum(amounts)


def test_wide_sum_carry_boundary(spark):
    # lo sums to exactly k * 10^18: rem must be 0-padded, carry exact
    amounts = ["0.500000000000000000"] * 4
    df = spark.createDataFrame([Row(g=1, s=a) for a in amounts], "g int, s string")
    out = exact_wide_sum(df, ["g"], "s").collect()[0]
    assert out["sum_exact"] == "2." + "0" * 18


def test_wide_sum_flags_malformed(spark):
    df = spark.createDataFrame(
        [Row(g=1, s="1.5"), Row(g=1, s="-2.0"), Row(g=1, s="abc"), Row(g=1, s="1.2.3")],
        "g int, s string",
    )
    out = exact_wide_sum(df, ["g"], "s").collect()[0]
    assert out["n_bad"] == 3  # negative + garbage + double point all flagged


def test_wide_parts_padding(spark):
    df = spark.createDataFrame([Row(s="1.5")], "s string")
    hi, lo = wide_decimal_parts(F.col("s"))
    r = df.select(hi.alias("hi"), lo.alias("lo")).collect()[0]
    assert int(r["hi"]) == 1 and int(r["lo"]) == 5 * 10**17
