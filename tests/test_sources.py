"""Source/sink parity tests (SURVEY.md §2.1 S1-S9): parquet scans with
schema merge, catalog registration, existence probes, and the
CTAS/append/overwrite sink family the reference drives through
Iceberg/Delta (icberg/iceberg_tables.py:112,151; delta/delta_tables.py:
131,166) — here on the portable Spark-catalog + parquet path."""

import os

import pytest
from pyspark.sql import functions as F

from aws_glue_data_lake_spark.operators.cdc import save_table
from aws_glue_data_lake_spark.tables import (
    load_table,
    register_views,
    table_exists,
)


def test_merge_schema_read(spark, tmp_path):
    """S1: mergeSchema union-widens schemas across files — the
    DynamicFrame behavior (icberg/iceberg_tables.py:23)."""
    a = spark.range(3).select(F.col("id"), F.lit("x").alias("only_in_a"))
    b = spark.range(3).select(F.col("id"), F.lit(1.5).alias("only_in_b"))
    a.write.parquet(str(tmp_path / "t" / "p=1"))
    b.write.parquet(str(tmp_path / "t" / "p=2"))
    merged = spark.read.option("mergeSchema", "true").parquet(str(tmp_path / "t"))
    assert {"id", "only_in_a", "only_in_b"} <= set(merged.columns)
    assert merged.count() == 6


def test_catalog_register_and_probe(spark, sf_dir):
    """S2/S4: temp-view catalog binding + existence probe — the reference's
    createOrReplaceTempView / check_table_exist pair."""
    register_views(spark, sf_dir, names=("region",))
    assert table_exists(spark, "region")
    assert spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"] == 5
    assert not table_exists(spark, "no_such_table")


def test_sink_overwrite_and_append(spark, tmp_path):
    """S5-S8: overwrite (full load) then append (incremental) — the
    reference's two write modes (delta/delta_tables.py:131,166)."""
    path = str(tmp_path / "dest")
    df = spark.range(5).withColumn("v", F.col("id") * 2)
    save_table(df, path, mode="overwrite")
    assert spark.read.parquet(path).count() == 5
    save_table(df.where("id < 2"), path, mode="append")
    assert spark.read.parquet(path).count() == 7


def test_sink_partitioned_write(spark, tmp_path):
    """Partitioned layout: partition pruning must reach the file listing
    (the 100 TB table layout; the reference strips crawler partitions on
    read but real destinations partition on write)."""
    path = str(tmp_path / "events_by_type")
    df = spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "click")], "event_id long, event_type string"
    )
    df.write.partitionBy("event_type").mode("overwrite").parquet(path)
    assert os.path.isdir(os.path.join(path, "event_type=click"))
    pruned = spark.read.parquet(path).where(F.col("event_type") == "click")
    assert pruned.count() == 2
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_saveastable_roundtrip(spark):
    """S5 CTAS + S6 append through the session catalog (writeTo v2 API)."""
    spark.sql("DROP TABLE IF EXISTS ctas_probe")
    spark.range(4).write.saveAsTable("ctas_probe")
    assert table_exists(spark, "ctas_probe")
    spark.range(2).write.mode("append").saveAsTable("ctas_probe")
    assert spark.table("ctas_probe").count() == 6
    spark.sql("DROP TABLE ctas_probe")


def test_load_table_nanos_convention(spark, sf_dir):
    """events.ts (TIMESTAMP NANOS) loads as int64 epoch-ns under the
    engine convention regardless of caller session defaults."""
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "bigint"
