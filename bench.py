#!/usr/bin/env python
"""Benchmark harness.

Measures (1) the north-star metric — change-events/sec applied end-to-end
(event log → latest-wins → extraction → lakehouse MERGE) — and (2) headline
query latencies at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "cdc": {"n_events": N, "events_per_sec": X, "seconds": S},
   "scaling": {"cores_small": 8, "eps_small": ..., "cores_large": 32,
               "eps_large": ..., "efficiency": ...}}

Scaling evidence (BASELINE.md protocol): the same CDC apply job runs at two
parallelism levels (local[8] vs local[32]) on the same input; efficiency =
(eps_large / eps_small) / (cores_large / cores_small).
Set SPARK_GRAFT_SKIP_SCALING=1 to skip the two-level run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CDC_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "1000000"))
N_SCALING_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS", "500000"))

HEADLINE = [
    "latest_per_key",
    "asof_join",
    "windowed_stats_30m",
    "running_total",
    "pricing_summary",
    "parts_revenue",
    "exact_dedup_docs",
    "minhash_lsh_dups",
    "cosine_topk",
]


def make_session(cores: int):
    from cosmwasm_etl_spark.session import build_session

    # local mode shares one JVM heap across driver+executors: size it for
    # 8 KB-page Arrow batches or GC (GCLocker) serializes the UDF path
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    return build_session(
        app_name=f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=max(cores, 8),
    )


BODY_WORDS = int(os.environ.get("SPARK_GRAFT_BODY_WORDS", "1000"))  # ≈8 KB/page


def run_cdc_apply(spark, n_events: int, epochs_per_batch: int = 5) -> dict:
    """Generate a deterministic event log on disk, then replay it through the
    full pipeline into a fresh lakehouse table. Returns throughput stats."""
    from pyspark.sql import functions as F

    from cosmwasm_etl_spark.plans.pipeline import CdcPipeline, create_pages_table
    from cosmwasm_etl_spark.sources.eventlog import synthetic_events, write_event_log

    work = tempfile.mkdtemp(prefix="bench_cdc_")
    try:
        events_dir = os.path.join(work, "events")
        n_urls = max(n_events // 20, 1000)
        epe = max(n_events // 10, 1)  # 10 epochs
        gen = synthetic_events(
            spark, n_events, n_urls=n_urls, events_per_epoch=epe, body_words=BODY_WORDS
        )
        write_event_log(gen, events_dir, range_partitions=max(CPUS, 8))
        events = spark.read.parquet(events_dir)

        table = create_pages_table(spark, os.path.join(work, "pages"), num_buckets=max(CPUS, 16))
        pipe = CdcPipeline(
            spark, table, os.path.join(work, "work"),
            sink_mode=os.environ.get("SPARK_GRAFT_SINK_MODE", "mor"),
        )
        t0 = time.time()
        pipe.run_replay(events, epochs_per_batch=epochs_per_batch)
        dt = time.time() - t0
        return {
            "n_events": n_events,
            "seconds": round(dt, 3),
            "events_per_sec": round(n_events / dt, 1),
            "final_rows": table.read().count(),
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def run_queries(spark) -> dict[str, float]:
    from cosmwasm_etl_spark.queries import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.time() - t0, 3)
    return times


def main() -> None:
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out: dict = {"sf": sf}

    spark = make_session(CPUS)
    try:
        cdc = run_cdc_apply(spark, N_CDC_EVENTS)
        out["cdc"] = cdc
        qt = run_queries(spark)
        out["queries"] = qt
    finally:
        spark.stop()

    if os.environ.get("SPARK_GRAFT_SKIP_SCALING") != "1":
        small_cores, large_cores = max(CPUS // 4, 2), CPUS
        eps = {}
        for cores in (small_cores, large_cores):
            s = make_session(cores)
            try:
                r = run_cdc_apply(s, N_SCALING_EVENTS)
                eps[cores] = r["events_per_sec"]
            finally:
                s.stop()
        eff = (eps[large_cores] / eps[small_cores]) / (large_cores / small_cores)
        out["scaling"] = {
            "cores_small": small_cores,
            "eps_small": eps[small_cores],
            "cores_large": large_cores,
            "eps_large": eps[large_cores],
            "efficiency": round(eff, 3),
        }

    out["metric"] = "cdc_apply_events_per_sec_plus_headline_queries"
    out["unit"] = "sec"
    out["value"] = round(sum(out["queries"].values()) + out["cdc"]["seconds"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
