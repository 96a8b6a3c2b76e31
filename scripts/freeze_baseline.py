"""Summarize N bench runs into the calib-normalized baseline table
(VERDICT r5 #1): per-family median suite seconds, divided by the runs'
median calib_cpu_sec, so the frozen bar survives host drift — future
rounds compare THEIR family/calib ratios against this table instead of
raw wall-clock.

Usage: python scripts/freeze_baseline.py BENCH_FULL_run1.json [run2 ...]
Prints a markdown table + one JSON line to paste into BASELINE.md.
"""

from __future__ import annotations

import json
import re
import statistics
import sys

#: name → family: longest matching prefix wins.
FAMILY_PREFIXES = (
    "dedup_", "sim_", "text_", "streaming_", "cdc_", "lake_", "scan_",
    "join_", "agg_", "set_", "sort_", "window_", "scalar_", "subquery_",
    "sample_", "pipeline_", "multimodal_", "unpivot_", "events_",
    "flagship_", "funnel_", "cohort_", "graph_", "dq_", "emb_",
    "profile_", "sql_",
)


def family_of(name: str) -> str:
    for p in FAMILY_PREFIXES:
        if name.startswith(p):
            return p.rstrip("_")
    if re.match(r"q\d+_", name):
        return "tpch"
    return "other"


def main() -> int:
    runs = [json.load(open(p)) for p in sys.argv[1:]]
    if not runs:
        print("usage: freeze_baseline.py BENCH_FULL1.json [...]", file=sys.stderr)
        return 2
    calib = statistics.median(r["calib_cpu_sec"] for r in runs)
    calib_scan = statistics.median(r["calib_scan_sec"] for r in runs)
    names = sorted(set().union(*[r["queries"].keys() for r in runs]))
    per_query = {
        n: statistics.median(r["queries"][n] for r in runs if n in r["queries"])
        for n in names
    }
    fams: dict[str, list[str]] = {}
    for n in names:
        fams.setdefault(family_of(n), []).append(n)

    total = sum(per_query.values())
    print(f"| family | queries | median sec | sec/calib_cpu |")
    print(f"|---|---|---|---|")
    table = {}
    for fam in sorted(fams):
        sec = sum(per_query[n] for n in fams[fam])
        table[fam] = {
            "n": len(fams[fam]),
            "sec": round(sec, 2),
            "per_calib": round(sec / calib, 2),
        }
        print(f"| {fam} | {len(fams[fam])} | {sec:.2f} | {sec / calib:.2f} |")
    print(f"| **total** | {len(names)} | {total:.2f} | {total / calib:.2f} |")
    summary = {
        "n_runs": len(runs),
        "calib_cpu_sec": round(calib, 4),
        "calib_scan_sec": round(calib_scan, 4),
        "suite_sec": round(total, 2),
        "suite_per_calib": round(total / calib, 1),
        "families": table,
    }
    print()
    print(json.dumps(summary, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
