"""scripts/plan_audit.py: the breadth plan auditor must actually catch the
banned patterns — feed it a row-wise Python UDF plan and a cartesian
product and assert it flags them, then a representative clean query and
assert it doesn't."""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    spec = importlib.util.spec_from_file_location(
        "plan_audit", os.path.join(REPO, "scripts", "plan_audit.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_flags_rowwise_python_udf(spark):
    pa = _load()
    bad = F.udf(lambda s: s.upper(), T.StringType())
    df = spark.range(10).select(bad(F.col("id").cast("string")).alias("x"))
    rep = pa.audit_one("bad", df)
    assert "row-wise-python-udf" in rep["flags"]


def test_flags_cartesian_product(spark):
    """A broadcastable cross join plans as BroadcastNestedLoopJoin (the
    sanctioned single-row/broadcast form); a true CartesianProduct only
    appears when neither side broadcasts — force that and assert the flag."""
    pa = _load()
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = spark.range(100).crossJoin(spark.range(100))
        rep = pa.audit_one("cross", df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "cartesian-product" in rep["flags"]


def test_clean_query_not_flagged(spark):
    pa = _load()
    import __spark_entry__ as entry

    df = entry.queries()["pricing_summary"](spark, "/root/testdata/sf0.001")
    rep = pa.audit_one("pricing_summary", df)
    assert rep["flags"] == []
    assert rep["scans"] >= 1 and rep["exchanges"] >= 1
