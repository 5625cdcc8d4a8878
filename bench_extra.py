#!/usr/bin/env python
"""Per-query isolation bench (guide §1.4): times each named query with the
noop sink in a fresh-but-warm session, optionally dumping
``explain("formatted")`` to plans/<tag>/<query>_<suffix>.txt.

NOT the driver's bench — bench.py stays frozen for measurement. This file
exists so optimization work can isolate one query at a time and keep
before/after plan artifacts (OPTIMIZATION_r06.md cites these numbers).

Usage:
  python bench_extra.py [query ...]          # time queries (default: all headline)
  python bench_extra.py --plans r06 --suffix before [query ...]
  SPARK_GRAFT_REPEATS=3 python bench_extra.py minhash_lsh_dups
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))


def make_session():
    from cosmwasm_etl_spark.session import build_session

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    extra = {
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    }
    shm = "/dev/shm/spark_graft_extra"
    os.makedirs(shm, exist_ok=True)
    extra["spark.local.dir"] = os.path.join(shm, "local")
    return build_session(
        app_name="bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(CPUS, 8),
        extra_conf=extra,
    )


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    suffix = "before"
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        args = args[:i] + args[i + 2:]
    if "--suffix" in args:
        i = args.index("--suffix")
        suffix = args[i + 1]
        args = args[:i] + args[i + 2:]

    from cosmwasm_etl_spark.queries import QUERIES

    names = args or [
        "latest_per_key", "asof_join", "windowed_stats_30m", "running_total",
        "pricing_summary", "parts_revenue", "exact_dedup_docs",
        "minhash_lsh_dups", "cosine_topk", "dedup_clusters", "lang_id_docs",
        "simhash_dups", "embedding_near_dups", "ivf_ann", "gopher_quality",
        "tfidf_top_terms", "ngram_lm_score", "url_canonical_dedup",
        "decontaminate", "pii_redact", "segment_dedup", "substring_span_dups",
        "pack_docs", "resample_docs", "shuffle_order",
    ]
    spark = make_session()
    times: dict[str, list[float]] = {}
    try:
        for name in names:
            fn = QUERIES[name]
            if plans_tag:
                os.makedirs(f"plans/{plans_tag}", exist_ok=True)
                df = fn(spark, SF_DIR)
                with open(f"plans/{plans_tag}/{name}_{suffix}.txt", "w") as fh:
                    fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                        df._jdf.queryExecution(), "formatted"))
            samples = []
            for _ in range(REPEATS):
                spark.sparkContext.setJobDescription(f"bench_extra:{name}")
                t0 = time.time()
                df = fn(spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                samples.append(round(time.time() - t0, 3))
                spark.sparkContext.setJobDescription(None)
            times[name] = samples
            print(f"{name}: {samples}", file=sys.stderr)
    finally:
        try:
            spark.stop()
        except Exception:
            pass
    print(json.dumps({
        "sf_dir": SF_DIR,
        "times": times,
        "min_total": round(sum(min(v) for v in times.values()), 3),
    }))


if __name__ == "__main__":
    main()
