"""corpus_prep job: the training-data composition (dedup → Gopher filter
→ deterministic split → partitioned write) verified against the SAME
DuckDB oracle SQL the driver uses for the individual operators — the
composed job must agree with the composition of the independently
verified pieces."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def _load_job():
    spec = importlib.util.spec_from_file_location(
        "corpus_prep", os.path.join(REPO, "jobs", "corpus_prep.py")
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_parse_weights():
    job = _load_job()
    assert job.parse_weights("train=0.98,val=0.01,test=0.01") == {
        "train": 0.98,
        "val": 0.01,
        "test": 0.01,
    }
    with pytest.raises(ValueError, match="bad weights"):
        job.parse_weights("train")


def test_corpus_prep_matches_composed_oracles(spark, tmp_path):
    job = _load_job()
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    observed, obs_in, obs = job.build_corpus_plan(docs, weights, seed=42)
    out = str(tmp_path / "corpus")
    observed.write.mode("overwrite").partitionBy("split").parquet(out)

    m = obs.get
    assert obs_in.get["n_in"] == docs.count()
    # partitioned layout: each split is its own prunable directory
    dirs = {d for d in os.listdir(out) if d.startswith("split=")}
    assert dirs <= {"split=train", "split=val", "split=test"}

    back = spark.read.parquet(out)
    assert back.count() == m["n_out"]
    split_counts = {r["split"]: r["n"] for r in back.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(split_counts.values()) == m["n_out"]
    assert split_counts == {k: m[f"n_{k}"] for k in weights if m[f"n_{k}"]}

    # expected survivors = (exact-dedup winners) ∩ (gopher_ok docs), both
    # computed by the INDEPENDENT DuckDB oracle SQL from the driver gate
    from cosmwasm_etl_spark.queries import ORACLES

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    dedup_ids = {r[0] for r in con.sql(ORACLES["exact_dedup_docs"]).fetchall()}
    ok_ids = {
        r[0]
        for r in con.sql(
            f"SELECT doc_id FROM ({ORACLES['gopher_quality']}) WHERE gopher_ok"
        ).fetchall()
    }
    expected = dedup_ids & ok_ids
    got = {r["doc_id"] for r in back.select("doc_id").collect()}
    assert got == expected

    # determinism: a second run assigns every doc to the same split
    observed2, _, _ = job.build_corpus_plan(docs, weights, seed=42)
    a = {(r["doc_id"], r["split"]) for r in observed2.select("doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in back.select("doc_id", "split").collect()}
    assert a == b
