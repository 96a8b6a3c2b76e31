"""SparkSession factory (replaces the reference's Glue bootstrap,
``icberg/iceberg_tables.py:13-17`` / ``delta/delta_tables.py:51-56``).

Design point is a 1000-executor cluster on ~100 TB; the local[$CPUS]
session used in tests carries the same configuration so plans exercised
here (AQE, broadcast thresholds, pushdown) are the plans we'd ship.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# The reference depends on case-insensitive column resolution: it drops the
# column "Op" while the data column is "op" (icberg/iceberg_tables.py:110,149)
# and detects the op column via col.lower() == "op" (:82). Spark's default
# (caseSensitive=false) is load-bearing — keep it explicit.
_BASE_CONF: dict[str, str] = {
    # Runtime re-planning: shuffle-partition coalescing and skew-join
    # splitting are the 100 TB safety net for every join/agg in the library.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.caseSensitive": "false",
    # Arrow for every pandas_udf / mapInPandas boundary (multimodal ops).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Columnar scan hygiene — on by default, pinned so a misconfigured
    # environment can't silently turn the scans row-at-a-time.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Timestamps in the fixtures are TIMESTAMP (no TZ semantics in DuckDB);
    # keep session TZ stable so Spark/oracle comparisons are tz-independent.
    "spark.sql.session.timeZone": "UTC",
    # events.ts is parquet TIMESTAMP(NANOS) — Spark's TimestampType is
    # micros-only, so nanos surface as int64 epoch-nanoseconds (exactly
    # ordered, exactly comparable to DuckDB's epoch_ns(ts)).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Long-lived sessions run hundreds of queries (the bench suite, the
    # driver's correctness sweep): the UI server and its listeners retain
    # per-execution plan graphs and job/stage data for all of them, which
    # is pure heap churn for a headless engine. Off, and retention capped
    # for any externally-enabled UI.
    "spark.ui.enabled": "false",
    "spark.sql.ui.retainedExecutions": "20",
    "spark.ui.retainedJobs": "100",
    "spark.ui.retainedStages": "100",
}


def default_parallelism() -> int:
    """Worker-thread count for local mode (driver contract: SPARK_GRAFT_CPUS)."""
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "aws-glue-data-lake-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession.

    ``shuffle_partitions`` defaults to the core count: at local test scale a
    shuffle partition should be a few MB; on a real cluster this is the knob
    sized to keep post-shuffle partitions ~128MB (AQE coalesces the rest).
    """
    cpus = cpus or default_parallelism()
    builder = SparkSession.builder.appName(app_name).master(f"local[{cpus}]")
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    # Local mode runs everything in the driver JVM, whose 1g default heap
    # GC-thrashes once a long session accumulates caches + streaming state.
    # Size it like an executor (the box has 128 GiB). Ignored if the JVM
    # already exists (getOrCreate reuse) — harmless.
    conf.setdefault("spark.driver.memory", "16g")
    conf.setdefault("spark.driver.maxResultSize", "4g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
