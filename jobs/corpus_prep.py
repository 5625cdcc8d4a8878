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

Optional stages complete the training pipeline (each flag documents its
exchange cost; all default off):

- ``--eval-set``    benchmark decontamination (broadcast semi-join; the
                    extra exchange carries only contamination hits);
- ``--redact``      PII scrub to typed tokens (pure projection);
- ``--resample``    per-source temperature weights — deterministic
                    expected-w copies per doc (explode projection);
- ``--shuffle-shards`` deterministic training order as (shard,
                    shard_pos) — one window exchange partitioned by
                    shard, never a global sort;
- ``--max-dup-span-frac`` RefinedWeb-style duplicated-substring-span
                    coverage filter (span-stats chain + id semi-join;
                    see build_corpus_plan for the persist note).

Scale shape: the base plan has exactly one wide exchange (the dedup
groupBy); the filter and split are projections fused into the same stage;
the write needs no repartition because partitionBy(split) with 3 values
fans out from whatever partitioning dedup left (at 100 TB, set
--out-partitions to bound files per split). The job prints ONE JSON
summary line; re-running with the same inputs is deterministic
byte-for-byte in content (overwrite mode).
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


def build_corpus_plan(
    docs,
    weights: dict[str, float],
    seed: int,
    *,
    eval_set=None,
    min_overlap: int = 3,
    redact: bool = False,
    resample: dict[str, float] | None = None,
    shuffle_shards: int = 0,
    max_dup_span_frac: float | None = None,
    span_k: int = 8,
):
    """The full logical plan + its Observation (importable for tests).

    Optional stages compose the complete training-corpus pipeline; each
    states its exchange cost (the base plan keeps exactly one):

    - ``eval_set``: benchmark decontamination — drop docs sharing
      ≥ ``min_overlap`` distinct 5-gram shingles with the eval set
      (broadcast semi-join; the one extra exchange carries only hits);
    - ``redact``: PII scrub on the surviving text (pure projection);
    - ``resample``: per-source temperature weights (name -> w, with a
      ``default``) — floor(w) copies + stochastically-rounded extra,
      materialized by explode(sequence) (projection; ``copy`` joins the
      doc key downstream);
    - ``shuffle_shards``: deterministic training order — shard by
      hash(doc_id, copy), dense rank within shard (one window exchange
      partitioned by shard; never a global sort).
    """
    from pyspark.sql import Observation, Window
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.functions.dedup import benchmark_overlap, exact_dedup
    from cosmwasm_etl_spark.functions.sampling import (
        copy_sequence,
        resample_copies,
        shard_order,
        split_assign,
        split_frac,
    )
    from cosmwasm_etl_spark.functions.text import gopher_quality_ok, repetition_stats

    obs_in = Observation("corpus-prep-in")
    docs = docs.observe(obs_in, F.count(F.lit(1)).alias("n_in"))
    deduped = exact_dedup(docs, text_col="text", id_col="doc_id")
    stats = repetition_stats(F.col("text"))
    kept = deduped.withColumn("__q_ok", gopher_quality_ok(stats=stats)).filter(
        F.col("__q_ok")
    ).drop("__q_ok")

    if eval_set is not None:
        flagged = benchmark_overlap(kept, eval_set, min_overlap=min_overlap)
        clean_ids = flagged.filter(~F.col("contaminated")).select("doc_id")
        kept = kept.join(clean_ids, "doc_id", "left_semi")

    if max_dup_span_frac is not None:
        # RefinedWeb-style span filter: drop docs whose duplicated
        # substring-span coverage exceeds the threshold (boilerplate-heavy
        # pages exact dedup can't catch). Cost: the span-stats chain's
        # exchanges plus one id semi-join, and the span branch recomputes
        # the surviving-docs lineage — at deployment scale persist `kept`
        # before enabling this stage. Short docs (< span_k tokens, zero
        # windows) carry no evidence and are kept.
        from cosmwasm_etl_spark.functions.dedup import substring_span_stats

        spans = substring_span_stats(kept, text_col="text", id_col="doc_id", k=span_k)
        n_tokens = F.col("n_windows") + F.lit(span_k - 1)
        ok_ids = spans.filter(
            (F.col("n_windows") == 0)
            | (F.col("dup_tokens") / n_tokens <= F.lit(max_dup_span_frac))
        ).select("doc_id")
        kept = kept.join(ok_ids, "doc_id", "left_semi")

    if redact:
        from cosmwasm_etl_spark.functions.redaction import redact_pii

        kept = kept.withColumn("text", redact_pii(F.col("text")))

    assigned = kept.withColumn(
        "split", split_assign(F.col("doc_id"), weights, seed=seed)
    )

    if resample:
        default_w = resample.get("default", 1.0)
        wt = None
        for name, w in sorted(resample.items()):
            if name == "default":
                continue
            cond = F.col("source") == F.lit(name)
            wt = F.when(cond, F.lit(w)) if wt is None else wt.when(cond, F.lit(w))
        wt = F.lit(default_w) if wt is None else wt.otherwise(F.lit(default_w))
        assigned = assigned.withColumn(
            "copy",
            F.explode(copy_sequence(resample_copies(F.col("doc_id"), wt, seed=seed))),
        )
    else:
        assigned = assigned.withColumn("copy", F.lit(1))

    if shuffle_shards:
        ckey = F.xxhash64(F.col("doc_id"), F.col("copy"))
        assigned = assigned.withColumn(
            "shard", shard_order(ckey, shuffle_shards, seed=seed)
        ).withColumn("__frac", split_frac(ckey, seed=seed))
        w = Window.partitionBy("split", "shard").orderBy("__frac", "doc_id", "copy")
        assigned = assigned.withColumn(
            "shard_pos", F.row_number().over(w).cast("long")
        ).drop("__frac")

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
    ap.add_argument("--eval-set", default=None,
                    help="parquet of benchmark/eval docs; training docs sharing "
                         "--min-overlap distinct 5-grams with it are dropped")
    ap.add_argument("--min-overlap", type=int, default=3)
    ap.add_argument("--redact", action="store_true",
                    help="scrub emails/IPv4s/phones to typed tokens (projection)")
    ap.add_argument("--resample", default=None,
                    help="per-source temperature weights, e.g. "
                         "'web=0.5,books=2.5,default=1.0' — expected-w copies "
                         "per doc, deterministic in (doc_id, seed)")
    ap.add_argument("--shuffle-shards", type=int, default=0,
                    help="emit deterministic training order as (shard, shard_pos); "
                         "0 disables")
    ap.add_argument("--max-dup-span-frac", type=float, default=None,
                    help="drop docs whose duplicated substring-span coverage "
                         "(dup_tokens / n_tokens at --span-k) exceeds this "
                         "fraction; unset disables the stage")
    ap.add_argument("--span-k", type=int, default=8)
    args = ap.parse_args()
    weights = parse_weights(args.weights)

    from cosmwasm_etl_spark.session import build_session

    spark = build_session(app_name="corpus-prep")
    t0 = time.time()
    docs = spark.read.parquet(args.input)
    observed, obs_in, obs = build_corpus_plan(
        docs,
        weights,
        args.seed,
        eval_set=spark.read.parquet(args.eval_set) if args.eval_set else None,
        min_overlap=args.min_overlap,
        redact=args.redact,
        resample=parse_weights(args.resample) if args.resample else None,
        shuffle_shards=args.shuffle_shards,
        max_dup_span_frac=args.max_dup_span_frac,
        span_k=args.span_k,
    )
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
