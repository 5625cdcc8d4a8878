"""URL canonicalization: rule-by-rule literals, cross-engine twin parity,
and the zero-shuffle plan shape the CDC key path relies on."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cosmwasm_etl_spark.functions.urls import (
    canonical_url_sql_expr,
    canonicalize_url,
    host_of,
    host_sql_expr,
)

# (input, expected canonical) — one case per rule plus interactions
CASES = [
    # scheme+host lowercased, default port stripped, tracking dropped,
    # trailing slash dropped, fragment dropped
    ("http://Example.COM:80/a/b/?utm_campaign=x#frag", "http://example.com/a/b"),
    # non-default port kept; params sorted; utm_* dropped mid-list
    ("https://example.com:8443/x?z=1&utm_x=1&y=2", "https://example.com:8443/x?y=2&z=1"),
    # empty path becomes /
    ("http://example.com", "http://example.com/"),
    ("http://example.com:8080?a=1", "http://example.com:8080/?a=1"),
    # https default port stripped on root path
    ("https://example.com:443/", "https://example.com/"),
    # all params tracking -> no query part at all
    ("http://example.com/?fbclid=abc&gclid=1", "http://example.com/"),
    # no percent-decoding (conservative identity)
    ("http://example.com/a%20b?q=hello%20world", "http://example.com/a%20b?q=hello%20world"),
    # surrounding whitespace trimmed
    ("  http://example.com/x  ", "http://example.com/x"),
    # path case preserved (only scheme/host fold)
    ("HTTPS://EXAMPLE.com/Path/Sub/", "https://example.com/Path/Sub"),
    # empty fragment dropped
    ("http://example.com/#", "http://example.com/"),
    # duplicate keys survive, sorted bytewise
    ("http://example.com/a?b=2&a=1&a=0", "http://example.com/a?a=0&a=1&b=2"),
    # dangling '?' -> no query
    ("http://example.com/a?", "http://example.com/a"),
    # root slash kept
    ("http://example.com/", "http://example.com/"),
    # param whose NAME merely contains 'utm' is NOT tracking (anchored regex)
    ("http://example.com/a?autm_x=1", "http://example.com/a?autm_x=1"),
]


def test_canonicalize_url_literals(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    got = [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]
    assert got == [exp for _, exp in CASES]


def test_sql_twin_matches_spark_on_literals(spark):
    """The DuckDB twin must agree with the Column implementation on every
    rule — this is what makes the driver oracle a real check."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    spark_out = [
        (r[0], r[1])
        for r in df.select(
            canonicalize_url(F.col("url")), host_of(F.col("url"))
        ).collect()
    ]
    values = ", ".join(f"('{u}')" for u, _ in CASES)  # no quotes in CASES inputs
    duck_out = duckdb.sql(
        f"SELECT {canonical_url_sql_expr('url')}, {host_sql_expr('url')} "
        f"FROM (VALUES {values}) t(url)"
    ).fetchall()
    assert spark_out == [tuple(r) for r in duck_out]


def test_host_of(spark):
    df = spark.createDataFrame(
        [("http://WWW.Site.Example.COM:8080/x?y=1",), ("https://a.b/",)], ["url"]
    )
    assert [r[0] for r in df.select(host_of(F.col("url"))).collect()] == [
        "www.site.example.com",
        "a.b",
    ]


def test_url_canonical_dedup_plan_is_projection_plus_one_exchange(spark, sf_dir):
    """Canonicalization must stay a JVM-side projection: no Python UDF
    stages, and the only exchange is the canonical-key hash aggregate
    (with a map-side partial), i.e. the same shape that holds at 10^10
    rows."""
    from cosmwasm_etl_spark.queries import q_url_canonical_dedup

    plan = q_url_canonical_dedup(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan and plan.count("Exchange hashpartitioning") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "partial_count" in plan or "partial_min" in plan, plan


def test_canonicalize_is_idempotent(spark):
    """Canonical output must be a fixed point — the pipeline may
    normalize at more than one entry point and must not re-key."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], ["url"])
    once = df.select(canonicalize_url(F.col("url")).alias("c"))
    twice = once.select(canonicalize_url(F.col("c")).alias("c2"), F.col("c"))
    assert twice.filter(F.col("c2") != F.col("c")).count() == 0
