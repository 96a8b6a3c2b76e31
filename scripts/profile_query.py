#!/usr/bin/env python
"""Per-job profile of a single registered query (optimization guide §1).

Runs ``queries()[name]`` at the given sf_dir on the engine session, then
dumps every Spark job's wall-clock, stage/task counts, and the Python
call site that triggered it — the local-mode stand-in for the Spark UI's
Jobs page (the UI is disabled in headless runs, session.py).

Usage:
    python scripts/profile_query.py <query_name> [sf_dir] [--explain]
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_glue_data_lake_spark.queries import all_queries
from aws_glue_data_lake_spark.session import get_spark


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    want_explain = "--explain" in sys.argv

    os.environ["SPARK_GRAFT_NO_REORDER"] = "1"
    spark = get_spark("profile")
    sc = spark.sparkContext
    fn = all_queries()[name]

    # Python-side job log: wrap the Py4J-level runJob is fragile; instead
    # poll the status tracker after the fact. Simpler and robust: use the
    # JVM AppStatusStore through the statusTracker for job info, and
    # correlate with our own wall-clock breadcrumbs via setJobDescription.
    spark.range(1).count()  # warm

    t0 = time.perf_counter()
    df = fn(spark, sf_dir)
    t_build = time.perf_counter() - t0
    t0 = time.perf_counter()
    rows = df.limit(200_000).collect()
    t_collect = time.perf_counter() - t0

    tracker = sc.statusTracker()
    jobs = []
    for jid in tracker.getJobIdsForGroup(None) or []:
        info = tracker.getJobInfo(jid)
        if info is None:
            continue
        jobs.append((jid, info))
    # JVM store has richer info (duration); go through the Java side.
    jsc = sc._jsc.sc()
    store = jsc.statusStore()
    jlist = store.jobsList(None)
    out = []
    n = jlist.size()
    for i in range(n):
        j = jlist.apply(i)
        dur = None
        sub = end = None
        try:
            st = j.submissionTime()
            ct = j.completionTime()
            if st.isDefined() and ct.isDefined():
                sub = st.get().getTime() / 1000.0
                end = ct.get().getTime() / 1000.0
                dur = end - sub
        except Exception:
            pass
        out.append(
            {
                "job": j.jobId(),
                "sec": dur,
                "sub": sub,
                "end": end,
                "desc": (j.description().get() if j.description().isDefined() else j.name())[:140],
                "tasks": j.numTasks(),
                "stages": j.stageIds().size(),
            }
        )
    out.sort(key=lambda d: d["job"])
    total_job = sum(d["sec"] or 0 for d in out)
    print(f"\n== {name} @ {sf_dir}: build {t_build:.2f}s, action {t_collect:.2f}s, rows {len(rows)} ==")
    print(f"{len(out)} jobs, sum of job durations {total_job:.2f}s (gaps = driver/Python time)")
    prev_end = None
    for d in out:
        # gap = idle driver/Python time between the previous job's finish
        # and this job's submission — where Catalyst/py4j/pure-Python cost
        # hides (jobs overlap under concurrent actions; negative gaps mean
        # overlap, printed as 0).
        gap = 0.0
        if prev_end is not None and d["sub"] is not None:
            gap = max(0.0, d["sub"] - prev_end)
        if d["end"] is not None:
            prev_end = d["end"] if prev_end is None else max(prev_end, d["end"])
        print(f"  job {d['job']:>4} {d['sec'] if d['sec'] is not None else -1:7.3f}s gap={gap:6.3f}s tasks={d['tasks']:<4} stages={d['stages']} {d['desc']}")
    if want_explain:
        df.explain("formatted")
    return 0


if __name__ == "__main__":
    sys.exit(main())
