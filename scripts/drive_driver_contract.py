"""Drive the driver contract end-to-end, the way the round driver does:

1. build a VANILLA SparkSession (none of our session-factory configs —
   the driver owns its session, we must work inside it);
2. import __spark_entry__; run entry(spark), check rows>0 + schema;
3. run every queries()[name] at sf0.01 and hash-compare against
   oracle_sql()[name] via DuckDB views (local mirror of t2).

Usage: python scripts/drive_driver_contract.py [--sf-dir DIR] [--only NAME...]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument(
        "--sorted",
        action="store_true",
        help="iterate sorted by name instead of registry order (the driver "
        "iterates registry order and may stop early, so registry order is "
        "the faithful default)",
    )
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--driver-mem",
        default=None,
        help="driver heap override (e.g. 8g). Default None = the vanilla "
        "1g, matching the round driver at sf0.01. A full 99-query session "
        "at sf0.1 holds ~all the memoized sketches + streaming state and "
        "OOMs the 1g default around query 60 — heap sizing is an "
        "operational knob, not part of the session-config contract the "
        "vanilla default exists to catch, so scale probes pass 8g.",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # Vanilla session — deliberately NOT aws_glue_data_lake_spark.get_spark().
    builder = SparkSession.builder.appName("drive-driver-contract").master(
        f"local[{args.cpus}]"
    )
    if args.driver_mem:
        builder = builder.config("spark.driver.memory", args.driver_mem)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as mod

    print("== entry() smoke ==", flush=True)
    df = mod.entry(spark)
    rows = df.collect()
    print(f"entry: {len(rows)} rows, schema={[f.name for f in df.schema.fields]}")
    assert len(rows) > 0, "entry returned 0 rows"

    from aws_glue_data_lake_spark.oracle import compare_result, run_oracle

    queries = mod.queries()
    oracles = mod.oracle_sql()
    names = args.only or (sorted(queries) if args.sorted else list(queries))
    failures = []
    total_start = time.time()
    for name in names:
        start = time.time()
        sdf = queries[name](spark, args.sf_dir)
        if name in oracles:
            problems = compare_result(sdf, run_oracle(oracles[name], args.sf_dir))
            status = "OK " if not problems else "FAIL"
            if problems:
                failures.append((name, problems))
        else:
            sdf.limit(5).collect()
            status = "ROWS"
        print(
            f"{status} {name} ({time.time() - start:.1f}s, "
            f"cum {time.time() - total_start:.0f}s)",
            flush=True,
        )

    if failures:
        print("\n== FAILURES ==")
        for name, problems in failures:
            print(name)
            for p in problems:
                print("  ", p)
        return 1
    print(f"\nall {len(names)} queries verified at {args.sf_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
