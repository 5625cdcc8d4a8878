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


def test_corpus_prep_full_composition(spark, tmp_path):
    """All optional stages on: decontaminate → redact → resample →
    sharded shuffle. Verifies the contaminated doc is gone, PII is
    scrubbed, copy counts follow the per-source weights exactly
    (recomputed independently), and (shard, shard_pos) is a dense
    deterministic order."""
    job = _load_job()
    weights = {"train": 1.0}
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)

    # eval set = one real doc's text -> that doc must be dropped
    leak = docs.orderBy("doc_id").limit(1)
    leak_id = leak.collect()[0]["doc_id"]
    eval_set = leak.select("doc_id", "text")

    # plant PII in every doc so redaction is observable
    dirty = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" mail root@evil.example.com"))
    )

    resample = {"default": 1.0, **{
        r["source"]: 2.0
        for r in docs.select("source").distinct().limit(2).collect()
    }}
    observed, obs_in, obs = job.build_corpus_plan(
        dirty, weights, seed=42,
        eval_set=eval_set, min_overlap=3,
        redact=True, resample=resample, shuffle_shards=8,
    )
    out = str(tmp_path / "corpus_full")
    observed.write.mode("overwrite").partitionBy("split").parquet(out)
    back = spark.read.parquet(out)

    assert back.filter(F.col("doc_id") == leak_id).count() == 0
    assert back.filter(F.col("text").contains("@")).count() == 0
    assert back.filter(~F.col("text").contains("<EMAIL>")).count() == 0

    # copy counts: recompute the expected counts independently
    from cosmwasm_etl_spark.functions.sampling import resample_copies

    survivors = back.select("doc_id", "source").distinct()
    wt = F.when(
        F.col("source").isin([k for k in resample if k != "default"]), F.lit(2.0)
    ).otherwise(F.lit(1.0))
    expected = {
        r["doc_id"]: r["n"]
        for r in survivors.select(
            "doc_id", resample_copies(F.col("doc_id"), wt, seed=42).alias("n")
        ).collect()
    }
    got = {
        r["doc_id"]: r["n"]
        for r in back.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert got == expected

    # shard order: dense 1..k positions per (split, shard)
    groups = {}
    for r in back.collect():
        groups.setdefault((r["split"], r["shard"]), []).append(r["shard_pos"])
    assert groups and all(
        sorted(v) == list(range(1, len(v) + 1)) for v in groups.values()
    )


def test_dup_span_filter_drops_stitched_docs(spark):
    """--max-dup-span-frac: a doc half-stitched from another doc's text is
    dropped; the (longer) source doc and unrelated docs survive. Both runs
    share the same plan builder so the only delta is the span stage."""
    job = _load_job()
    import string

    def words(n, salt):
        # distinct 6-char words (pass Gopher: mean len 6, no repetition)
        return [f"w{salt}{string.ascii_lowercase[i % 26]}{i:03d}" for i in range(n)]

    a = words(32, "a")                      # long original
    b = a[:8] + words(8, "b")               # 8-token span stitched from a
    c = words(16, "c")                      # clean control
    rows = [
        (1, " ".join(a), len(" ".join(a))),
        (2, " ".join(b), len(" ".join(b))),
        (3, " ".join(c), len(" ".join(c))),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, n_chars: long")
    weights = {"train": 1.0}

    base, _, _ = job.build_corpus_plan(docs, weights, seed=1)
    assert {r.doc_id for r in base.collect()} == {1, 2, 3}

    filtered, _, _ = job.build_corpus_plan(
        docs, weights, seed=1, max_dup_span_frac=0.4, span_k=8
    )
    # doc 1: dup_tokens 8 / 32 tokens = 0.25 <= 0.4 -> kept
    # doc 2: dup_tokens 8 / 16 tokens = 0.50 >  0.4 -> dropped
    assert {r.doc_id for r in filtered.collect()} == {1, 3}
