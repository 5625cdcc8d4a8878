"""The pure-Python oracle stack (functions/pyoracle.py) must stand on its
own: XXH64 against the public spec's known vector, against Spark's xxhash64
across every type path the engine uses, and Java-semantics rounding."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmwasm_etl_spark.functions.pyoracle import (
    hash_bytes,
    hash_int,
    hash_long,
    round_half_up,
    to_signed,
    tokens_py,
    xxh64_longs,
    xxh64_str,
)

# Edge cases around XXH64's 32-byte stripe / 8-byte / 4-byte / tail-byte
# boundaries, plus multi-byte UTF-8.
STRINGS = [
    "", "a", "ab", "abc", "abcd", "don't",
    "x" * 7, "x" * 8, "x" * 9, "y" * 31, "y" * 32, "y" * 33,
    "z" * 63, "z" * 64, "z" * 65, "w" * 100,
    "naïve café — über 日本語 текст",
]


def test_xxh64_public_spec_vector():
    # XXH64(empty, seed=0) from the public xxHash specification
    assert hash_bytes(b"", 0) == 0xEF46DB3751D8E999


def test_xxh64_matches_spark_all_type_paths(spark):
    rows = [(i, s, (i * 0x9E3779B97F4A7C15 - 5) % (1 << 63), i * 7919 - 3) for i, s in enumerate(STRINGS)]
    df = spark.createDataFrame(rows, "i int, s string, l long, n int")
    got = df.select(
        "i", "s", "l", "n",
        F.xxhash64("s").alias("hs"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("n").alias("hn"),
        F.xxhash64("l", "s").alias("hls"),
        F.xxhash64(F.lit(45), "l").alias("hil"),
        F.xxhash64("l", "l", "l", "l").alias("h4l"),
    ).collect()
    for r in got:
        assert r["hs"] == xxh64_str(r["s"])
        assert r["hl"] == xxh64_longs(r["l"])
        assert r["hn"] == to_signed(hash_int(r["n"], 42))
        assert r["hls"] == to_signed(hash_bytes(r["s"].encode(), hash_long(r["l"], 42)))
        assert r["hil"] == to_signed(hash_long(r["l"], hash_int(45, 42)))
        assert r["h4l"] == xxh64_longs(r["l"], r["l"], r["l"], r["l"])


def test_tokens_match_spark_tokenizer(spark):
    from cosmwasm_etl_spark.functions.text import tokens

    texts = [
        "Hello, World!  foo_bar",  # underscore is NOT \p{L}\p{N}
        "  don't stop-me now  ",
        "数据 处理 текст 123abc",
        "", "   ", "a'b''c",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = df.select("t", tokens(F.col("t")).alias("toks")).collect()
    for r in got:
        assert list(r["toks"]) == tokens_py(r["t"]), r["t"]


@pytest.mark.parametrize(
    "x,d,expected",
    [
        (0.1234565, 6, 0.123457),  # HALF_UP, not banker's (Python round gives .123456)
        (2.5, 0, 3.0),
        (-0.0000005, 6, -0.000001),
        (1.0, 6, 1.0),
    ],
)
def test_round_half_up(x, d, expected):
    assert round_half_up(x, d) == expected
