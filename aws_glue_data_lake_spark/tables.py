"""Parquet table loader + catalog registration.

Replaces the reference's Glue-catalog source scan
(``get_source_table``, icberg/iceberg_tables.py:54-58 /
delta/delta_tables.py:76-80): ``spark.read.parquet`` with optional
``mergeSchema`` (the DynamicFrame's schema-union behavior,
icberg/iceberg_tables.py:23).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

#: Driver-fixture tables (TESTDATA.md) — one parquet file per table.
TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    merge_schema: bool = False,
) -> DataFrame:
    """Scan one fixture table. ``merge_schema`` union-widens schemas across
    files, matching the reference's ``{"mergeSchema": "true"}`` read option."""
    # events.ts is parquet TIMESTAMP(NANOS); Spark rejects it unless nanos
    # are read as int64. Set here (not only in our session factory) so
    # driver-provided sessions work too. Engine-wide convention: nanosecond
    # event time = BIGINT epoch-ns (DuckDB twin: epoch_ns(ts)).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Bind every fixture table as a temp view (the reference's
    ``createOrReplaceTempView`` pattern, icberg/iceberg_tables.py:69-70) so
    SQL-surface queries can run against the same names DuckDB pre-registers."""
    dfs = load_tables(spark, sf_dir, names)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


def table_exists(spark: SparkSession, name: str) -> bool:
    """Catalog existence probe — the reference's try/except ``check_table_exist``
    (icberg/iceberg_tables.py:73-78) done through the catalog API instead."""
    return spark.catalog.tableExists(name)
