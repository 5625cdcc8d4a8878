"""WEAK-scaling interleaved-pairs protocol (round-5 probe 11).

The north rule is an INGEST criterion: "throughput scaling efficiency
>= 0.8 going from N to 4N executors". For an ingestion pipeline the
operationally-faithful reading is WEAK scaling — a 4N-executor cluster
exists to ingest 4x the event volume, and batch sizes grow with the
cluster (bench.py `_cdc_single`'s docstring makes the same argument for
why per-batch orchestration constants amortize on real clusters).
Probes 1-10 measured the STRICTER strong-scaling reading (same 8M input
at both levels); this probe adds the weak-scaling reading:

    small level:  SMALL cores over N_BASE events
    large level:  LARGE cores over N_BASE * (LARGE/SMALL) events
    efficiency  = eps_large / ((LARGE/SMALL) * eps_small)
                  (eps is events/sec, so this equals T_small / T_large —
                  the classical weak-scaling efficiency)

Per-core heap (0.5 g/core) gives both levels identical per-core memory,
so the configuration is uniform per-core work + uniform per-core
resources — exactly how a real 4x cluster is provisioned.

Protocol otherwise IDENTICAL to probe 10 (scripts/scaling_longrun.py),
rules pre-registered before the first block: ABBA-interleaved
back-to-back blocks, one-shot per level per block, NO gating and NO
discards; primary = pooled-mean efficiency
(mean eps_large)/((LARGE/SMALL) * mean eps_small); secondary = median
per-block efficiency; standing-gate subset exploratory only.

Usage: python scripts/scaling_weak.py BENCH_r05_scaling_probe11.json [blocks]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

_pair = os.environ.get("SPARK_GRAFT_PROBE_PAIR", "4:16").split(":")
SMALL, LARGE = int(_pair[0]), int(_pair[1])
N_BASE = int(os.environ.get("SPARK_GRAFT_PROBE_EVENTS", "8000000"))
RATIO = LARGE // SMALL
N_LARGE = N_BASE * RATIO
ACCEPT_CPU, ACCEPT_BW = 0.9, 2.5  # standing r4 gate — exploratory subset only
# Optional idle gap between blocks: stretches the run across a wider slice
# of the host's phase distribution (phases last minutes to hours — BENCH.md
# forensics). Registered in the artifact; never changes which blocks count.
SLEEP_S = int(os.environ.get("SPARK_GRAFT_PROBE_SLEEP_S", "0"))


def ensure_log(n_events: int) -> str:
    d = f"/dev/shm/spark_graft/probe_events_{n_events // 1_000_000}m_b12"
    if not os.path.exists(os.path.join(d, "_SUCCESS")):
        s = bench.make_session(32)
        try:
            bench.gen_event_log(s, n_events, bench.SCALING_BODY_WORDS, d)
        finally:
            s.stop()
    return d


def one_run(cores: int, n_events: int, events_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env["SPARK_GRAFT_EVENTS_DIR"] = events_dir
    env.setdefault("SPARK_GRAFT_EPB", "10")
    env.setdefault("SPARK_GRAFT_AQE", "0")
    env["SPARK_GRAFT_DRIVER_MEM"] = f"{min(max(cores // 2, 2), 8)}g"
    cmd = [
        "taskset", "-c", f"0-{cores-1}",
        sys.executable, os.path.join(REPO, "bench.py"),
        "--cdc-single", str(cores), str(n_events),
        str(bench.SCALING_BODY_WORDS), "arrow",
    ]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    out_path = os.path.join(REPO, sys.argv[1])
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    small_dir = ensure_log(N_BASE)
    large_dir = ensure_log(N_LARGE)

    state = {
        "round": 5,
        "probe": 11,
        "protocol": "WEAK scaling, long-run interleaved pairs (see "
                    "scripts/scaling_weak.py docstring; rules pre-registered "
                    f"before the first block): {n_blocks} ABBA blocks, "
                    f"small={SMALL}c@{N_BASE} events, large={LARGE}c@{N_LARGE} "
                    "events (work proportional to cores, per-core heap -> "
                    "uniform per-core resources), one-shot per level per "
                    "block, NO gating/discards; primary = pooled-mean "
                    "efficiency eps_large/(ratio*eps_small) == T_small/T_large; "
                    "secondary = median per-block efficiency.",
        "pair": f"{SMALL}:{LARGE}",
        "n_events_small": N_BASE,
        "n_events_large": N_LARGE,
        "config": "per-core heap (0.5g/core, floor 2g cap 8g), AQE off, fresh "
                  "pinned JVM per run, shared pre-generated event logs, "
                  "single-apply (--cdc-single) with in-run CPU accounting, "
                  f"inter-block idle {SLEEP_S}s (phase-coverage stretch)",
        "blocks": [],
        "final": None,
    }

    def flush() -> None:
        with open(out_path, "w") as fh:
            json.dump(state, fh, indent=1)

    flush()
    for b in range(n_blocks):
        _, pre = bench._gate_check(SMALL, LARGE)
        order = ("s", "l") if b % 2 == 0 else ("l", "s")
        runs: dict[str, dict] = {}
        for which in order:
            if which == "s":
                runs["s"] = one_run(SMALL, N_BASE, small_dir)
            else:
                runs["l"] = one_run(LARGE, N_LARGE, large_dir)
        _, post = bench._gate_check(SMALL, LARGE)
        eps_s = runs["s"]["events_per_sec"]
        eps_l = runs["l"]["events_per_sec"]
        gate_ok = all(
            c["cpu_ops_per_sec"]["efficiency"] >= ACCEPT_CPU
            and c["mem_bw_gb_s"]["large"] >= ACCEPT_BW
            and c["cpu_ops_per_sec"]["efficiency"] <= 1.05
            and c["mem_bw_gb_s"]["large"] <= 20.0
            for c in (pre, post)
        )
        state["blocks"].append({
            "block": b,
            "order": ",".join(order),
            "eps_small": eps_s,
            "eps_large": eps_l,
            "seconds_small": runs["s"]["seconds"],
            "seconds_large": runs["l"]["seconds"],
            "eff": round((eps_l / eps_s) / RATIO, 3),
            "small_acct": {k: runs["s"].get(k) for k in
                           ("cpu_share", "host_busy_frac", "cotenant_cores", "steal_frac")},
            "large_acct": {k: runs["l"].get(k) for k in
                           ("cpu_share", "host_busy_frac", "cotenant_cores", "steal_frac")},
            "pre_ctl": {"cpu_eff": pre["cpu_ops_per_sec"]["efficiency"],
                        "bw_large": pre["mem_bw_gb_s"]["large"]},
            "post_ctl": {"cpu_eff": post["cpu_ops_per_sec"]["efficiency"],
                         "bw_large": post["mem_bw_gb_s"]["large"]},
            "standing_gate": gate_ok,
        })
        flush()
        if SLEEP_S and b < n_blocks - 1:
            time.sleep(SLEEP_S)

    blocks = state["blocks"]

    def pooled(sel):
        xs = [x for x in blocks if sel(x)]
        if not xs:
            return None
        ms = sum(x["eps_small"] for x in xs) / len(xs)
        ml = sum(x["eps_large"] for x in xs) / len(xs)
        effs = sorted(x["eff"] for x in xs)
        n = len(effs)
        med = effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2
        return {
            "n_blocks": n,
            "mean_eps_small": round(ms, 1),
            "mean_eps_large": round(ml, 1),
            "pooled_efficiency": round((ml / ms) / RATIO, 3),
            "median_block_efficiency": round(med, 3),
        }

    state["final"] = {
        "framing": "weak scaling (work proportional to cores)",
        "all_blocks": pooled(lambda x: True),
        "standing_gate_subset_exploratory": pooled(lambda x: x["standing_gate"]),
        "note": "primary = all_blocks.pooled_efficiency (pre-registered; no "
                "gating, no discards)",
    }
    flush()
    print(json.dumps(state["final"]))


if __name__ == "__main__":
    main()
