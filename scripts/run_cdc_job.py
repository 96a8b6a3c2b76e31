#!/usr/bin/env python
"""CDC lakehouse job runner — the engine's equivalent of the reference's
``main()`` orchestration (icberg/iceberg_tables.py:157-212 and
delta/delta_tables.py:171-227), with every AWS-only dependency replaced by
the open stack:

| reference                                   | here                        |
|---------------------------------------------|-----------------------------|
| getResolvedOptions(sys.argv, [...])         | argparse                    |
| GlueContext/Job bootstrap                   | session.get_spark()         |
| get_source_table (catalog DynamicFrame)     | parquet path read           |
| check_table_exist (catalog probe)           | LakeTable.exists()          |
| Iceberg CTAS / MERGE+append                 | LakeTable.create / upsert   |
| console banner prints                       | logging                     |

Branch logic mirrors the reference exactly: drop crawler ``partition_*``
columns, probe the destination, FULL load when absent (no-op ``op``
handling when the source carries none — iceberg_tables.py:183-188),
INCREMENTAL merge (watermark filter → latest-per-key → delete handling →
upsert) when present. Each invocation is one job run; rerun for the next
batch, exactly like scheduling the Glue job.

Usage:
    python scripts/run_cdc_job.py --source /path/batch.parquet \\
        --table /path/lake_table --keys event_id --date-col ts
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

log = logging.getLogger("run_cdc_job")


def make_target(spark, table_path: str, fmt: str = "lake"):
    """Pick the CDC sink: the versioned lake table (default) or a REAL
    Delta / Iceberg table via the jar-free format-compat writers — the
    reference's two actual destinations (delta/delta_tables.py:159-160,
    icberg/iceberg_tables.py:143-146)."""
    if fmt == "lake":
        from aws_glue_data_lake_spark.lake import LakeTable

        return LakeTable(table_path)
    if fmt == "delta":
        from aws_glue_data_lake_spark.targets import DeltaTarget

        return DeltaTarget(table_path, spark)
    if fmt == "iceberg":
        from aws_glue_data_lake_spark.targets import IcebergTarget

        return IcebergTarget(table_path, spark)
    raise ValueError(f"unknown --format {fmt!r} (lake|delta|iceberg)")


def run_job(
    spark,
    source_path: str,
    table_path: str,
    keys: list[str],
    date_col: str,
    fmt: str = "lake",
) -> dict:
    """One CDC job run; returns a small result summary (rows, mode)."""
    from aws_glue_data_lake_spark.operators.cdc import (
        drop_columns,
        get_partition_cols,
        has_op_col,
        merge_cdc_batch,
    )
    from aws_glue_data_lake_spark.queries.cdc_queries import _SENTINEL_US
    from aws_glue_data_lake_spark.tables import with_ts_us

    log.info("reading source batch from %s", source_path)
    df = spark.read.option("mergeSchema", "true").parquet(source_path)
    df = drop_columns(df, get_partition_cols(df))
    sentinel = None  # full_load's default timestamp sentinel
    if date_col in [f.name for f in df.schema.fields]:
        # normalize the event-time column in place to epoch-µs int64
        # (physical-type drift safety); the full-load sentinel then has to
        # be the µs equivalent of the reference's '1900-01-01'
        df = with_ts_us(df, date_col)
        sentinel = _SENTINEL_US

    table = make_target(spark, table_path, fmt)
    existed = table.exists()
    # merge_cdc_batch IS the reference's full-vs-incremental branch
    # (destination probe → full load CTAS | watermark+dedup+delete merge),
    # against the versioned lake table instead of Iceberg/Delta.
    result = merge_cdc_batch(
        table, df, keys=keys, date_col=date_col, sentinel=sentinel
    )
    if not existed:
        mode = "full"
    elif result.applied:
        mode = "incremental"
    else:
        mode = "noop"
    n = table.read(spark).count()
    log.info("job done: mode=%s rows=%d", mode, n)
    return {"mode": mode, "rows": n, "op_col": has_op_col(df)}


def main() -> int:
    logging.basicConfig(level=logging.INFO, format="%(name)s %(message)s")
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--source", required=True, help="source batch parquet path")
    ap.add_argument("--table", required=True, help="destination lake table root")
    ap.add_argument("--keys", required=True, help="comma-separated primary key")
    ap.add_argument("--date-col", default="ts", help="event-time column")
    ap.add_argument(
        "--format",
        default="lake",
        choices=("lake", "delta", "iceberg"),
        help="destination table format (real Delta/Iceberg via the "
        "jar-free compat writers, like the reference's two scripts)",
    )
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from aws_glue_data_lake_spark.session import get_spark

    spark = get_spark("cdc-job", cpus=args.cpus)
    out = run_job(
        spark,
        args.source,
        args.table,
        args.keys.split(","),
        args.date_col,
        fmt=args.format,
    )
    print(out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
