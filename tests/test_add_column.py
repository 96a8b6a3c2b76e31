"""ALTER TABLE ... ADD COLUMN — standalone metadata-only schema
evolution on Delta (schemaString grows; columnMapping ids assigned) and
Iceberg (new schema-id under a fresh field id). Prior rows must read
NULL; ADD COLUMN ... DEFAULT is refused per the Delta protocol."""

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)
from aws_glue_data_lake_spark.icebergcompat import (
    IcebergTableReader,
    IcebergTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def test_delta_add_column_old_rows_read_null(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t = open_table(path, "delta")
    sql(spark, "ALTER TABLE t ADD COLUMN score bigint", tables={"t": t})
    # old row null-fills; new appends land values
    w.append(spark.createDataFrame(
        [(2, "b", 20)], "k long, v string, score long"
    ))
    got = sorted(
        (r["k"], r["v"], r["score"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, "a", None), (2, "b", 20)]
    with pytest.raises(ValueError, match="already exists"):
        w.add_column("score", "bigint")


def test_delta_add_column_under_column_mapping(spark, tmp_path):
    # FOREIGN id-mode table, built empty so every data file stages
    # through the mapping-aware writer (physical names + field ids)
    import json as _json
    import os as _os

    path = str(tmp_path / "t")
    log = _os.path.join(path, "_delta_log")
    _os.makedirs(log)
    schema_string = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {
                 "delta.columnMapping.id": 1,
                 "delta.columnMapping.physicalName": "col-1",
             }},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {
                 "delta.columnMapping.id": 2,
                 "delta.columnMapping.physicalName": "col-2",
             }},
        ],
    })
    with open(_os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["columnMapping"],
                "writerFeatures": ["columnMapping"],
            }},
            {"metaData": {
                "id": "t", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "2",
                },
                "createdTime": 0,
            }},
        ]:
            f.write(_json.dumps(a) + "\n")

    w2 = DeltaTableWriter(path)
    w2.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    w2.add_column("score", "bigint")
    snap = DeltaTableReader(path).snapshot()
    md = snap.schema["score"].metadata
    assert md["delta.columnMapping.id"] == 3
    assert md["delta.columnMapping.physicalName"].startswith("col-")
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "3"
    # write path honors the mapping: new column lands under its
    # physical name + field id and reads back logically
    w2.append(spark.createDataFrame(
        [(2, "b", 20)], "k long, v string, score long"
    ))
    got = sorted(
        (r["k"], r["score"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, None), (2, 20)]


def test_delta_add_column_default_refused(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame([(1,)], "k long"))
    t = open_table(path, "delta")
    with pytest.raises(DeltaProtocolError, match="DEFAULT"):
        sql(
            spark,
            "ALTER TABLE t ADD COLUMN s string DEFAULT 'x'",
            tables={"t": t},
        )
    # the documented two-step works: add, then set the default
    sql(spark, "ALTER TABLE t ADD COLUMN s string", tables={"t": t})
    sql(
        spark,
        "ALTER TABLE t ALTER COLUMN s SET DEFAULT 'x'",
        tables={"t": t},
    )
    w.append(spark.createDataFrame([(2,)], "k long"))
    got = sorted(
        (r["k"], r["s"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, None), (2, "x")]


def test_iceberg_add_column_new_schema_id(spark, tmp_path):
    path = str(tmp_path / "t")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    open_table(path, "iceberg").add_column("score", "bigint")
    meta = IcebergTableReader(path)._metadata()
    assert len(meta["schemas"]) == 2
    cur = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"]
    )
    assert [f["name"] for f in cur["fields"]] == ["k", "v", "score"]
    assert cur["fields"][-1]["id"] == meta["last-column-id"] == 3
    # old file null-fills; an append with the new column lands
    w.append(spark.createDataFrame(
        [(2, "b", 20)], "k long, v string, score long"
    ))
    got = sorted(
        (r["k"], r["score"])
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, None), (2, 20)]
