"""Training-data pipeline operators: dedup recall, ANN recall, multimodal
plumbing, routing DFS."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cosmwasm_etl_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from cosmwasm_etl_spark.functions.multimodal import extract_media_features, synthetic_media
from cosmwasm_etl_spark.functions.similarity import cosine_topk, lsh_bucketed_topk
from cosmwasm_etl_spark.routing import enumerate_routes


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").persist()
    d.count()
    yield d
    d.unpersist()


def test_exact_dedup_with_planted_dups(spark, docs):
    planted = docs.limit(20).withColumn("doc_id", F.col("doc_id") + 100_000)
    both = docs.unionByName(planted)
    kept = exact_dedup(both, "text", "doc_id")
    # representative = lowest id -> originals win
    assert kept.count() == docs.count()
    assert kept.filter(F.col("doc_id") >= 100_000).count() == 0


def test_minhash_lsh_recall_vs_exact(spark, docs):
    """LSH candidates must recover ≥90% of true pairs at jaccard≥0.3 and
    report identical jaccard values for the pairs it finds."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(docs, threshold=0.3, k=32, bands=8).collect()
    }
    assert exact, "fixture should contain some near-dup pairs at 0.3"
    # no false positives (verification step recomputes exact jaccard)
    for pair, j in approx.items():
        assert pair in exact and abs(j - exact[pair]) < 1e-9
    recall = len(set(approx) & set(exact)) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_simhash_finds_planted_near_dups(spark, docs):
    # plant lightly-perturbed copies: append one token
    perturbed = docs.limit(15).select(
        (F.col("doc_id") + 200_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzzz")).alias("text"),
    )
    base = docs.select("doc_id", "text")
    both = base.unionByName(perturbed)
    pairs = simhash_near_dups(both, max_hamming=3)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted_found = {(a, b) for (a, b) in found if b == a + 200_000}
    assert len(planted_found) >= 12  # ≥80% of 15 planted


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("embedding")
    )
    queries = emb.filter(F.col("vec_id") < 30)
    exact = cosine_topk(emb, queries, k=5)
    approx = lsh_bucketed_topk(emb, queries, dim=64, k=5, n_planes=4)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, f"ANN recall too low: {recall:.3f}"  # 4 planes, single probe


def test_multimodal_feature_plumbing(spark):
    media = synthetic_media(spark, n=64)
    feats = extract_media_features(media)
    rows = feats.collect()
    assert len(rows) == 64
    for r in rows:
        assert r.n_bytes > 0 and len(r.sha256) == 64 and len(r.feature) == 8
    # determinism across runs
    again = {r.media_id: r.sha256 for r in extract_media_features(media).collect()}
    assert all(again[r.media_id] == r.sha256 for r in rows)


def test_routing_bounded_dfs():
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")]
    routes = enumerate_routes(edges, max_hops=2)
    ab = [r for r in routes if r[0] == "a" and r[1] == "c"]
    got = sorted(tuple(r[2]) for r in ab)
    assert got == [("a", "b", "c"), ("a", "c")]
    # no path exceeds hop bound; no revisits
    for _, _, path, hops in routes:
        assert hops <= 2 and len(set(path)) == len(path)
