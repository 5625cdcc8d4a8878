"""Tests for bench.py's in-run CPU accounting (/proc parsing, no Spark).

The accounting separates the two causes of a low scaling reading on a
shared host — co-tenant CPU steal vs memory-system IPC stall — so its
parsing must be robust: comm fields with spaces/parens, dead PIDs racing
the walk, and the delta arithmetic that turns raw jiffies into shares.
"""

from __future__ import annotations

import importlib.util
import multiprocessing
import os
import time


def _load_bench():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location("bench_mod", os.path.join(repo, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def _burn(seconds: float) -> None:
    end = time.time() + seconds
    x = 0
    while time.time() < end:
        x += 1


def test_proc_tree_cpu_counts_self_and_children():
    before = bench._proc_tree_cpu_s()
    procs = [multiprocessing.Process(target=_burn, args=(0.6,)) for _ in range(2)]
    for p in procs:
        p.start()
    _burn(0.6)  # burn in-process too
    for p in procs:
        p.join()
    # children have exited (reaped) — re-sample while they are still live
    # is covered by the lower bound from the in-process burn alone; the
    # upper bound checks the walk did not double-count ancestors
    after = bench._proc_tree_cpu_s()
    delta = after - before
    assert delta >= 0.4, f"own burn not counted: {delta}"
    assert delta < 60.0, f"implausible tree CPU delta: {delta}"


def test_proc_tree_cpu_monotonic_and_fast():
    t0 = time.time()
    a = bench._proc_tree_cpu_s()
    b = bench._proc_tree_cpu_s()
    assert b >= a - 1e-6  # monotonic up to reaped children
    assert time.time() - t0 < 2.0  # /proc walk must be cheap


def test_host_busy_returns_sane_pair():
    busy0, steal0 = bench._host_busy_s()
    _burn(0.3)
    busy1, steal1 = bench._host_busy_s()
    assert busy1 >= busy0  # cumulative counters
    assert steal1 >= steal0
    assert busy1 - busy0 >= 0.2  # our own burn is host-visible


def test_cpu_accounting_delta_shape():
    before = bench._cpu_accounting()
    _burn(0.5)
    out = bench._cpu_accounting_delta(before, wall_s=0.5, cores=1)
    assert set(out) == {"cpu_share", "host_busy_frac", "cotenant_cores", "steal_frac"}
    # one pinned core burning for the full window: share near 1 (allow
    # scheduler noise), never wildly above
    assert 0.5 <= out["cpu_share"] <= 2.0, out
    assert out["steal_frac"] >= 0.0
    assert out["cotenant_cores"] >= 0.0


def test_cpu_accounting_delta_zero_wall_guard():
    before = bench._cpu_accounting()
    out = bench._cpu_accounting_delta(before, wall_s=0.0, cores=4)
    assert out["cpu_share"] is None  # no divide-by-zero
