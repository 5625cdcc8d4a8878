"""Training-corpus preparation job (spark-submit entry point).

The composition the training-data operators exist FOR: one job that takes
a raw document table and produces a deduplicated, quality-filtered,
split-assigned corpus, partitioned by split for downstream loaders.

    spark-submit --py-files dist/cosmwasm_etl_spark.zip jobs/corpus_prep.py \
        --input  /data/documents.parquet \
        --output /data/corpus \
        [--min-lang-docs 0] [--seed 42] \
        [--weights train=0.98,val=0.01,test=0.01]

Stages (ONE logical plan end to end — input and output counts both ride
the single write action as ``Observation`` metrics, so nothing is
recomputed and nothing is collected):

1. exact dedup      — sha2(normalized text) groupBy, lowest doc_id wins
                      (map-side combine collapses boilerplate before the
                      exchange — a million-copy page ships once per task);
2. quality filter   — Gopher repetition rules (zero-shuffle projection:
                      longest-run-in-sorted-array, functions/text.py);
3. split assignment — deterministic xxhash64(key, seed): stable across
                      reruns/partitionings/cluster sizes and under corpus
                      growth, so val/test never leak into train between
                      dataset versions;
4. write            — parquet partitioned by split (each split is its own
                      prunable directory for downstream loaders).

Scale shape: exactly one wide exchange (the dedup groupBy); the filter and
split are projections fused into the same stage; the write needs no
repartition because partitionBy(split) with 3 values fans out from
whatever partitioning dedup left (at 100 TB, set --out-partitions to bound
files per split). The job prints ONE JSON summary line; re-running with
the same inputs is deterministic byte-for-byte in content (overwrite mode).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_weights(spec: str) -> dict[str, float]:
    out: dict[str, float] = {}
    for part in spec.split(","):
        name, _, val = part.partition("=")
        if not name or not val:
            raise ValueError(f"bad weights spec: {spec!r} (want name=frac,...)")
        out[name.strip()] = float(val)
    return out


def build_corpus_plan(docs, weights: dict[str, float], seed: int):
    """The full logical plan + its Observation (importable for tests)."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.functions.dedup import exact_dedup
    from cosmwasm_etl_spark.functions.sampling import split_assign
    from cosmwasm_etl_spark.functions.text import gopher_quality_ok, repetition_stats

    obs_in = Observation("corpus-prep-in")
    docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n_in"))
    deduped = exact_dedup(docs, text_col="text", id_col="doc_id")
    stats = repetition_stats(F.col("text"))
    kept = deduped.withColumn("__q_ok", gopher_quality_ok(stats=stats)).filter(
        F.col("__q_ok")
    )
    assigned = kept.drop("__q_ok").withColumn(
        "split", split_assign(F.col("doc_id"), weights, seed=seed)
    )
    obs = Observation("corpus-prep")
    observed = assigned.observe(
        obs,
        F.count(F.lit(1)).alias("n_out"),
        F.sum(F.col("n_chars")).alias("sum_chars"),
        *[
            F.sum((F.col("split") == F.lit(name)).cast("long")).alias(f"n_{name}")
            for name in weights
        ],
    )
    return observed, obs_in, obs


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--weights", default="train=0.98,val=0.01,test=0.01")
    ap.add_argument(
        "--out-partitions",
        type=int,
        default=None,
        help="repartition before write to bound files per split (100 TB knob)",
    )
    args = ap.parse_args()
    weights = parse_weights(args.weights)

    from cosmwasm_etl_spark.session import build_session

    spark = build_session(app_name="corpus-prep")
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    observed, obs_in, obs = build_corpus_plan(docs, weights, args.seed)
    if args.out_partitions:
        observed = observed.repartition(args.out_partitions, "doc_id")
    observed.write.mode("overwrite").partitionBy("split").parquet(args.output)
    # both observations ride the ONE write action — no second scan
    n_in = obs_in.get["n_in"]
    m = obs.get
    print(
        json.dumps(
            {
                "n_in": n_in,
                "n_out": m["n_out"],
                "n_dropped": n_in - m["n_out"],
                "sum_chars": m["sum_chars"],
                "splits": {name: m[f"n_{name}"] for name in weights},
                "seed": args.seed,
                "output": args.output,
                "wall_s": round(time.time() - t0, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
