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
    append_table_v2,
    create_table_v2,
    load_table,
    register_external_table,
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
    """S5 CTAS + S6 append through the session catalog (v1 writer API)."""
    spark.sql("DROP TABLE IF EXISTS ctas_probe")
    spark.range(4).write.saveAsTable("ctas_probe")
    assert table_exists(spark, "ctas_probe")
    spark.range(2).write.mode("append").saveAsTable("ctas_probe")
    assert spark.table("ctas_probe").count() == 6
    spark.sql("DROP TABLE ctas_probe")


def test_writerv2_create_append(spark):
    """S5/S6 on the DataFrameWriterV2 path the reference actually calls:
    writeTo(...).create() then writeTo(...).append()
    (icberg/iceberg_tables.py:112,151)."""
    spark.sql("DROP TABLE IF EXISTS v2_probe")
    create_table_v2(spark.range(4).withColumn("v", F.col("id") * 2), "v2_probe")
    assert table_exists(spark, "v2_probe")
    append_table_v2(spark.range(4, 6).withColumn("v", F.col("id") * 2), "v2_probe")
    assert spark.table("v2_probe").count() == 6
    spark.sql("DROP TABLE v2_probe")


def test_writerv2_partitioned_create(spark):
    spark.sql("DROP TABLE IF EXISTS v2_part_probe")
    df = spark.createDataFrame(
        [(1, "click"), (2, "view"), (3, "click")], "event_id long, event_type string"
    )
    create_table_v2(df, "v2_part_probe", partition_by=("event_type",))
    got = spark.table("v2_part_probe").where(F.col("event_type") == "click")
    assert got.count() == 2
    spark.sql("DROP TABLE v2_part_probe")


def test_external_table_ddl(spark, tmp_path):
    """S9: CREATE TABLE ... USING parquet LOCATION — a location-backed
    external table whose data survives DROP TABLE
    (delta/delta_tables.py:41-47)."""
    path = str(tmp_path / "ext")
    spark.range(5).withColumn("v", F.col("id") * 3).write.parquet(path)
    register_external_table(spark, "ext_probe", path)
    assert table_exists(spark, "ext_probe")
    assert spark.table("ext_probe").count() == 5
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql("DESCRIBE TABLE EXTENDED ext_probe").collect()
    }
    assert desc.get("Type") == "EXTERNAL"
    spark.sql("DROP TABLE ext_probe")
    # external semantics: dropping the table must not delete the data
    assert spark.read.parquet(path).count() == 5


def test_ts_us_col_dispatches_every_physical_type(spark):
    """Event-time normalization is by INSPECTED dtype, never by an assumed
    parquet physical type (the r4 fixture drift broke the old hard-coded
    convention). All four producer shapes must yield the same epoch-µs."""
    from aws_glue_data_lake_spark.tables import ts_us_col

    us = 1_706_000_000_123_456  # some µs instant with sub-second precision
    legacy_ns = spark.createDataFrame([(us * 1000,)], "ts bigint")
    ntz = spark.sql(f"SELECT timestampadd(MICROSECOND, {us}, TIMESTAMP_NTZ '1970-01-01') AS ts")
    ltz = spark.sql(f"SELECT timestamp_micros({us}) AS ts")
    assert ntz.dtypes == [("ts", "timestamp_ntz")]
    assert ltz.dtypes == [("ts", "timestamp")]
    for df in (legacy_ns, ntz, ltz):
        assert df.select(ts_us_col(df)).first()[0] == us
    date = spark.sql("SELECT DATE '2024-01-23' AS d")
    day_us = date.select(ts_us_col(date, "d")).first()[0]
    assert day_us == 19_745 * 86_400_000_000
    bad = spark.createDataFrame([("x",)], "ts string")
    with pytest.raises(TypeError, match="unsupported event-time dtype"):
        ts_us_col(bad)


def test_load_table_events_ts_normalizes(spark, sf_dir):
    """Whatever physical type the current fixture carries, the engine's
    normalization must agree with itself across a write/read round-trip."""
    from aws_glue_data_lake_spark.tables import with_ts_us

    ev = with_ts_us(load_table(spark, sf_dir, "events"))
    assert dict(ev.dtypes)["ts"] == "bigint"
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert 0 < lo <= hi


def test_json_dir_sink_two_phase_commit(spark, tmp_path):
    """The custom Python sink's atomic-visibility contract: a successful
    job leaves only committed part files + a _SUCCESS manifest whose
    counts match, and no staging residue."""
    import json
    import os

    from aws_glue_data_lake_spark.pydatasource import register_sink_source

    register_sink_source(spark)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    df = spark.range(100).selectExpr("id", "id * 2 AS doubled").repartition(4)
    df.write.format("json_dir_sink").option("path", out).mode("append").save()

    names = sorted(os.listdir(out))
    assert "_SUCCESS" in names
    assert "_staging" not in names  # no torn-write residue
    parts = [n for n in names if n.startswith("part-")]
    manifest = json.load(open(os.path.join(out, "_SUCCESS")))
    assert manifest["n_files"] == len(parts)
    assert manifest["n_rows"] == 100
    back = spark.read.schema("id BIGINT, doubled BIGINT").json(
        os.path.join(out, "part-*.json")
    )
    assert back.count() == 100
    assert back.selectExpr("sum(doubled)").first()[0] == 9900
