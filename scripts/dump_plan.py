#!/usr/bin/env python
"""Dump ``explain("formatted")`` for one or more registered queries to
``plans/r14/<query>_<tag>.txt`` (optimization-round deliverable).

Usage:
    python scripts/dump_plan.py before q1_pricing_summary dedup_semdedup ...
    python scripts/dump_plan.py after --all-touched touched.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_glue_data_lake_spark.queries import all_queries
from aws_glue_data_lake_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r15"),
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    os.environ["SPARK_GRAFT_NO_REORDER"] = "1"
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark("dump-plan")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(plan)
        print(f"wrote {out} ({len(plan)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
