"""Physical-layout operators: bucketed tables for shuffle-free co-located
joins.

The reference writes its destination tables unpartitioned and unbucketed
(`/root/reference/icberg/iceberg_tables.py:112`,
`/root/reference/delta/delta_tables.py:131`), so every downstream join over
them re-shuffles the fact table. At 100 TB the dominant cost of the
orders⋈lineitem family is exactly that shuffle: ~100 TB through the
exchange on every query. Bucketing both sides by the join key at write
time (`df.write.bucketBy(n, key).sortBy(key).saveAsTable(...)`) moves the
partitioning cost to ingest — paid once — after which Catalyst plans a
SortMergeJoin with **zero Exchange**: each task reads bucket i of both
tables locally. This module is the engine's ingest-side answer to
"pre-partition the lake for the query workload".

Sizing guidance at scale: pick bucket count so one bucket of the largest
table fits an executor's memory budget (e.g. 100 TB fact / 2 GB target
≈ 50k buckets); bucket counts on both sides must be equal (or integer
multiples with ``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed parquet table.

    ``sortBy`` orders rows within each bucket file so a downstream
    SortMergeJoin can skip its per-partition sort when Spark reads one
    file per bucket.

    Overwrite must be robust to a *stale managed location*: a fresh
    session's in-memory catalog has no such table, but the warehouse dir
    from an earlier session may still hold it, and saveAsTable then fails
    with LOCATION_ALREADY_EXISTS — drop the table and clear the leftover
    path first.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    stale = os.path.join(warehouse.removeprefix("file:"), table_name.lower())
    if os.path.isdir(stale):
        shutil.rmtree(stale, ignore_errors=True)
    # Pre-shuffle onto the bucket hash (repartition and bucketing share
    # Murmur3 HashPartitioning) so every task owns exactly one bucket and
    # writes exactly one file; without this, each of the N input tasks
    # writes up to num_buckets files → N·buckets small files and N sorts.
    from pyspark.sql import functions as F

    df = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: list[str] | list[Column] | Column,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket counts the physical plan carries no Exchange on either side —
    asserted by tests/test_plans.py."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
