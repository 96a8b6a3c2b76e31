#!/usr/bin/env python
"""Benchmark harness (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing method: build the plan lazily, then materialize with ``collect()``.
Every registered query returns an aggregated or top-k result (small by
construction), so ``collect()`` measures full plan execution without driver
blowup; a LIMIT cap guards misbehaving additions.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from aws_glue_data_lake_spark.queries import all_queries
from aws_glue_data_lake_spark.session import get_spark

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Cap on rows pulled back to the driver; headline queries are aggregates or
#: top-k so this only guards misbehaving additions.
COLLECT_CAP = 200_000


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SF_DIR
    # Bench runs must be comparable across rounds: registry order normally
    # rotates by green-correctness history (which CORRECTNESS_r*.json files
    # happen to be on disk), so pin plain module order here, then execute
    # sorted by name. The effective order is recorded in the output.
    os.environ["SPARK_GRAFT_NO_REORDER"] = "1"
    spark = get_spark("bench")
    queries = all_queries()
    # Forewarning for log readers (VERDICT r9 bookkeeping): a handful of
    # queries deliberately run DIMENSION-sized global windows (exact
    # distributed NTILE offsets, top-k over <=100-row aggregates), which
    # make Spark print "WindowExec: No Partition Defined ... may cause
    # serious performance degradation". The allowlist lives in
    # tests/test_plan_sweep.py; the warning is expected and bounded.
    print(
        "note: 'WindowExec: No Partition Defined' warnings below come "
        "from the allowlisted dimension-sized global windows "
        "(tests/test_plan_sweep.py) - expected, bounded input",
        file=sys.stderr,
    )

    timings: dict[str, float] = {}
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session bootstrap (bootstrap cost is reported separately).
    t0 = time.perf_counter()
    spark.range(1).count()
    warmup = time.perf_counter() - t0

    # Machine-speed calibration (round 5): identical code measured 72.7s at
    # r3 and ~160s at r5 with zero plan changes on the regressed queries —
    # the host drifts between rounds. Report two fixed reference workloads
    # (pure codegen CPU; parquet scan+agg) so suite seconds are comparable
    # across rounds as value/calib ratios, not raw wall-clock.
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr("sum(id * 2)").collect()
    calib_cpu = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).selectExpr(
        "sum(l_extendedprice * (1 - l_discount))", "count(*)"
    ).collect()
    calib_scan = time.perf_counter() - t0

    # Fault isolation: one broken query must never zero out the round's
    # perf signal (BENCH_r04 recorded "parsed": null because the run died
    # mid-suite). Each query gets its own try/except; failures land in
    # "errors" with a one-line cause and the suite keeps timing the rest.
    errors: dict[str, str] = {}
    total = 0.0
    for name, fn in sorted(queries.items()):
        start = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            df.limit(COLLECT_CAP).collect()
        except Exception as exc:  # noqa: BLE001 — isolation is the point
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            continue
        dt = time.perf_counter() - start
        timings[name] = round(dt, 4)
        total += dt

    out = {
        "metric": "suite_seconds",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "errors": errors,
        "sf": sf_from_dir(sf_dir),
        "n_queries": len(timings),
        "n_errors": len(errors),
        "warmup_sec": round(warmup, 4),
        "calib_cpu_sec": round(calib_cpu, 4),
        "calib_scan_sec": round(calib_scan, 4),
        # Execution order: alphabetical by query name (the loop above runs
        # sorted(queries)), independent of CORRECTNESS history. Warm-cache
        # memo families (dedup sketch, NTILE spend, staged fixtures) always
        # charge the build to the alphabetically-first member.
        "order": "sorted-by-name",
    }
    # The driver captures only a ~2 KB tail of stdout, and a single JSON
    # line with all 74 per-query timings exceeds that (BENCH_r01 recorded
    # "parsed": null with the line's head cut off). Persist the full result
    # to BENCH_FULL.json, then print a line guaranteed to fit: per-query
    # entries are added slowest-first until the byte budget is reached.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_FULL.json"), "w") as f:
        json.dump(out, f, indent=1)

    budget = 1600
    slowest = sorted(timings, key=timings.get, reverse=True)
    # On the one-line output keep only the failing names (full tracebacked
    # messages live in BENCH_FULL.json) so errors can't eat the byte budget.
    line_out = dict(
        out,
        queries={},
        queries_full="BENCH_FULL.json",
        errors=sorted(errors)[:20],
    )
    for name in slowest:
        candidate = dict(line_out)
        candidate["queries"] = dict(line_out["queries"], **{name: timings[name]})
        if len(json.dumps(candidate, separators=(",", ":"))) > budget:
            break
        line_out = candidate
    print(json.dumps(line_out, separators=(",", ":")))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
