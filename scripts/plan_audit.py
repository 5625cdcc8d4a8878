"""Physical-plan audit across the whole query surface.

Explains every registered query (``__spark_entry__.queries``) at a small
scale factor and flags the scale-killer patterns the repo bans:

- ``BatchEvalPython``      — a row-at-a-time Python UDF in the plan (the
                             repo allows only Arrow/pandas evaluation);
- ``CartesianProduct``     — an unkeyed join (the only sanctioned cross
                             joins are single-row/broadcast, which plan as
                             BroadcastNestedLoopJoin);
- ``SortMergeJoin`` over a ``LocalTableScan`` build side — a join whose
  build side is a driver-local literal table (always tiny) yet shuffles
  both sides instead of broadcasting.

It also records, per query, the scan count, how many scans carry pushed
filters, and the number of exchanges — the numbers to eyeball when a
query's latency moves between rounds. (Codegen spans are NOT reported:
under AQE the final physical plan — and its codegen ids — only exists
after execution; tests/test_physical_plans.py asserts codegen on the
executed headline plans.)

Planning only: nothing is executed except ``explain`` (Catalyst runs, no
job does), so the audit covers all queries in seconds.

Usage::

    python scripts/plan_audit.py [--sf /root/testdata/sf0.001] [--query NAME]
    # exit 1 iff any banned pattern is found

The per-query plan-shape assertions in tests/test_physical_plans.py pin
the headline queries' exact strategies; this script is the breadth
complement (every query, weaker checks).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001 — public explain, string form
        df._jdf.queryExecution(), "formatted"
    )


def audit_one(name: str, df) -> dict:
    plan = plan_of(df)
    flags = []
    if "BatchEvalPython" in plan:
        flags.append("row-wise-python-udf")
    if "CartesianProduct" in plan:
        flags.append("cartesian-product")
    # SortMergeJoin over a statically-tiny side: conservative textual check —
    # only flag when the plan itself shows a LocalTableScan/Range build side
    # (a parquet side's size is SF-dependent and AQE may still broadcast it)
    for m in re.finditer(r"SortMergeJoin", plan):
        ctx = plan[m.start() : m.start() + 400]
        if "LocalTableScan" in ctx:
            flags.append("smj-over-local-table")
            break
    scans = len(re.findall(r"Scan parquet|BatchScan", plan))
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    return {
        "flags": flags,
        "scans": scans,
        "scans_with_pushdown": pushed,
        "exchanges": len(re.findall(r"Exchange", plan)),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    ap.add_argument("--query", default=None, help="audit just one query")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from cosmwasm_etl_spark.session import build_session

    import __spark_entry__ as entry

    spark = build_session("plan_audit", extra_conf={"spark.ui.showConsoleProgress": "false"})
    qs = entry.queries()
    names = [args.query] if args.query else sorted(qs)
    report: dict[str, dict] = {}
    failed = []
    for n in names:
        try:
            report[n] = audit_one(n, qs[n](spark, args.sf))
        except Exception as e:  # a query that cannot even plan is a failure
            report[n] = {"flags": [f"plan-error: {e}"], "scans": 0}
        if report[n]["flags"]:
            failed.append(n)
    print(json.dumps({"sf": args.sf, "queries": report, "flagged": failed}, indent=1))
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
