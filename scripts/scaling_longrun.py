"""Long-run INTERLEAVED-PAIRS scaling protocol (round-5 probe 10).

Motivation, from the probe 1-9 record and the in-run CPU-accounting
forensics (BENCH.md): the host's 16-core throughput is bimodal across
equally-clean gated windows (590-870k vs 1.02-1.25M ev/s) while the
4-core side holds within +/-7%; during low-mode runs the engine's own
process tree still executes ~85% of the pinned CPU budget with ZERO
hypervisor steal and zero co-tenant cores — the modulation is per-cycle
efficiency (IPC) at the physical-host layer, invisible to, and
ungateable from, any in-VM control. Window-dodging has therefore hit
its resolution limit: a 1-s control bracket cannot certify what mode a
7-s run landed in.

The statistically-sound alternative is to STOP dodging and AVERAGE:
sample both parallelism levels many times, tightly interleaved so both
levels see the same phase distribution, and report pooled estimates.

Rules PRE-REGISTERED before the first block runs:

- BLOCKS paired back-to-back blocks; block i runs (small,large) when i
  is even and (large,small) when i is odd (ABBA — cancels linear drift
  to first order);
- one-shot per level per block (the pairing replaces best-of-k;
  max-of-k estimates the mode's ceiling, means estimate its average —
  this protocol estimates the average);
- NO window gating, NO discards: every block counts, whatever the host
  is doing (that is the point — both levels ride the same phases);
  host controls + in-run cpu_share/steal are recorded per block for
  ATTRIBUTION only;
- PRIMARY estimator: pooled-mean efficiency
      (mean eps_large) / ((large/small) * (mean eps_small));
- SECONDARY: median of per-block efficiencies;
- exploratory (reported, never primary): the same two estimators over
  the subset of blocks whose bracketing controls pass the standing r4
  gate (cpu >= 0.9, bw >= 2.5) — continuity with probes 1-9.

Config matches probes 1-9: 4:16 pinned, fresh JVM per run, per-core
heap (0.5 g/core, floor 2 g, cap 8 g), AQE off, shared pre-generated
8M-event body_words=12 log, single-apply measurement (--cdc-single).

Usage: python scripts/scaling_longrun.py BENCH_r05_scaling_probe10.json [blocks]
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
N_EVENTS = int(os.environ.get("SPARK_GRAFT_PROBE_EVENTS", "8000000"))
ACCEPT_CPU, ACCEPT_BW = 0.9, 2.5  # standing r4 gate — exploratory subset only


def one_run(cores: int) -> dict:
    """One pinned fresh-JVM single-apply run, same env as bench._run_scaling."""
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cores)
    env.setdefault("SPARK_GRAFT_EPB", "10")
    env.setdefault("SPARK_GRAFT_AQE", "0")
    env["SPARK_GRAFT_DRIVER_MEM"] = f"{min(max(cores // 2, 2), 8)}g"
    cmd = [
        "taskset", "-c", f"0-{cores-1}",
        sys.executable, os.path.join(REPO, "bench.py"),
        "--cdc-single", str(cores), str(N_EVENTS),
        str(bench.SCALING_BODY_WORDS), "arrow",
    ]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=1800)
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    out_path = os.path.join(REPO, sys.argv[1])
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    events_dir = f"/dev/shm/spark_graft/probe_events_{N_EVENTS // 1_000_000}m_b12"
    if not os.path.exists(os.path.join(events_dir, "_SUCCESS")):
        s = bench.make_session(32)
        try:
            bench.gen_event_log(s, N_EVENTS, bench.SCALING_BODY_WORDS, events_dir)
        finally:
            s.stop()
    os.environ["SPARK_GRAFT_EVENTS_DIR"] = events_dir

    state = {
        "round": 5,
        "probe": 10,
        "protocol": "long-run interleaved pairs (see scripts/scaling_longrun.py "
                    "docstring; rules pre-registered before the first block): "
                    f"{n_blocks} ABBA-ordered back-to-back blocks, one-shot per "
                    "level per block, NO gating and NO discards; primary = "
                    "pooled-mean efficiency, secondary = median per-block "
                    "efficiency; standing-gate subset reported as exploratory "
                    "continuity only.",
        "pair": f"{SMALL}:{LARGE}",
        "n_events": N_EVENTS,
        "config": "per-core heap (0.5g/core, floor 2g cap 8g), AQE off, fresh "
                  "pinned JVM per run, shared pre-generated event log, "
                  "single-apply (--cdc-single) with in-run CPU accounting",
        "blocks": [],
        "final": None,
    }

    def flush() -> None:
        with open(out_path, "w") as fh:
            json.dump(state, fh, indent=1)

    flush()
    for b in range(n_blocks):
        _, pre = bench._gate_check(SMALL, LARGE)
        order = (SMALL, LARGE) if b % 2 == 0 else (LARGE, SMALL)
        runs: dict[int, dict] = {}
        for cores in order:
            runs[cores] = one_run(cores)
        _, post = bench._gate_check(SMALL, LARGE)
        eps_s = runs[SMALL]["events_per_sec"]
        eps_l = runs[LARGE]["events_per_sec"]
        gate_ok = all(
            c["cpu_ops_per_sec"]["efficiency"] >= ACCEPT_CPU
            and c["mem_bw_gb_s"]["large"] >= ACCEPT_BW
            and c["cpu_ops_per_sec"]["efficiency"] <= 1.05
            and c["mem_bw_gb_s"]["large"] <= 20.0
            for c in (pre, post)
        )
        state["blocks"].append({
            "block": b,
            "order": f"{order[0]},{order[1]}",
            "eps_small": eps_s,
            "eps_large": eps_l,
            "eff": round((eps_l / eps_s) / (LARGE / SMALL), 3),
            "small_acct": {k: runs[SMALL].get(k) for k in
                           ("cpu_share", "host_busy_frac", "cotenant_cores", "steal_frac")},
            "large_acct": {k: runs[LARGE].get(k) for k in
                           ("cpu_share", "host_busy_frac", "cotenant_cores", "steal_frac")},
            "pre_ctl": {"cpu_eff": pre["cpu_ops_per_sec"]["efficiency"],
                        "bw_large": pre["mem_bw_gb_s"]["large"]},
            "post_ctl": {"cpu_eff": post["cpu_ops_per_sec"]["efficiency"],
                         "bw_large": post["mem_bw_gb_s"]["large"]},
            "standing_gate": gate_ok,
        })
        flush()

    blocks = state["blocks"]
    ratio = LARGE / SMALL

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
            "pooled_efficiency": round((ml / ms) / ratio, 3),
            "median_block_efficiency": round(med, 3),
        }

    state["final"] = {
        "all_blocks": pooled(lambda x: True),
        "standing_gate_subset_exploratory": pooled(lambda x: x["standing_gate"]),
        "note": "primary = all_blocks.pooled_efficiency (pre-registered; no "
                "gating, no discards)",
    }
    flush()
    print(json.dumps(state["final"]))


if __name__ == "__main__":
    main()
