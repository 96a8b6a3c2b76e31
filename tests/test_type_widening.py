"""ALTER COLUMN ... TYPE — type WIDENING DDL (VERDICT r12 item 4):
Delta stamps delta.typeChanges + the typeWidening reader/writer feature
(PROTOCOL.md § Type Widening); Iceberg commits a new schema-id under
the spec's legal promotions. Files written under the narrower type read
upcast — no rewrite."""

import json
import os
from decimal import Decimal

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)
from aws_glue_data_lake_spark.icebergcompat import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def test_delta_widen_then_append_reads_upcast(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, 10, 1.5)], "k long, n int, x float"
    ))
    t = open_table(path, "delta")
    sql(spark, "ALTER TABLE t ALTER COLUMN n TYPE bigint",
        tables={"t": t})
    sql(spark, "ALTER TABLE t ALTER COLUMN x TYPE double",
        tables={"t": t})
    # old file is NOT rewritten; its narrow bytes read upcast
    w.append(spark.createDataFrame(
        [(2, 2**40, 2.5)], "k long, n long, x double"
    ))
    got = sorted(
        (r["k"], r["n"], r["x"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, 10, 1.5), (2, 2**40, 2.5)]
    snap = DeltaTableReader(path).snapshot()
    f = snap.schema["n"]
    assert f.dataType.simpleString() == "bigint"
    assert (f.metadata or {})["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long"}
    ]
    proto = snap.raw_protocol
    assert "typeWidening" in proto["readerFeatures"]
    assert "typeWidening" in proto["writerFeatures"]


def test_delta_widen_decimal_and_refusals(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, Decimal("12.34"), "s")],
        "k long, d decimal(6,2), v string",
    ))
    w.widen_column_type("d", "decimal(12,4)")
    got = DeltaTableReader(path).to_df(spark).collect()[0]["d"]
    assert got == Decimal("12.3400")
    # narrowing / non-widening refuse loudly
    with pytest.raises(DeltaProtocolError, match="not a widening"):
        w.widen_column_type("k", "int")
    with pytest.raises(DeltaProtocolError, match="not a widening"):
        w.widen_column_type("v", "binary")
    with pytest.raises(DeltaProtocolError, match="not a widening"):
        w.widen_column_type("d", "decimal(6,4)")  # int digits shrink


def test_iceberg_widen_promotions_and_refusals(spark, tmp_path):
    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, 10, 1.5)], "k long, n int, x float"
    ))
    w.widen_column_type("n", "bigint")
    w.widen_column_type("x", "double")
    w.append(spark.createDataFrame(
        [(2, 2**40, 2.5)], "k long, n long, x double"
    ))
    got = sorted(
        (r["k"], r["n"], r["x"])
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, 10, 1.5), (2, 2**40, 2.5)]
    meta = IcebergTableReader(path)._metadata()
    cur = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"]
    )
    by = {f["name"]: f for f in cur["fields"]}
    assert by["n"]["type"] == "long" and by["x"]["type"] == "double"
    # field ids unchanged through the promotion (the safety property)
    first = meta["schemas"][0]
    assert {f["name"]: f["id"] for f in first["fields"]} == {
        f["name"]: f["id"] for f in cur["fields"]
    }
    # date->timestamp_ntz is a DELTA widening but NOT an iceberg
    # promotion; int->double likewise refused
    with pytest.raises(IcebergProtocolError, match="not a legal"):
        w.widen_column_type("k", "decimal(20,2)")


def test_uniform_widen_restricted_to_iceberg_promotions(
    spark, tmp_path
):
    """On a UniForm table the Delta widening set narrows to Iceberg's
    legal promotions — the synced view must stay spec-readable."""
    from tests.test_uniform import _uniform_table

    path = str(tmp_path / "t")
    _uniform_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(DeltaProtocolError, match="Iceberg type"):
        w.widen_column_type("k", "decimal(22,0)")


def test_nested_field_widening_both_formats(spark, tmp_path):
    """Dotted-path ALTER COLUMN TYPE (round 13): widen a struct
    subfield — Spark's parquet reader upcasts nested leaves natively
    under the pinned schema (verified empirically), so the change is
    metadata-only on both formats."""
    # Delta
    dp = str(tmp_path / "d")
    wd = DeltaTableWriter(dp)
    wd.create(spark.createDataFrame(
        [(1, (10, 1.5))], "k long, s struct<a:int,x:float>"
    ))
    t = open_table(dp, "delta")
    sql(spark, "ALTER TABLE t ALTER COLUMN s.a TYPE bigint",
        tables={"t": t})
    wd.widen_column_type("s.x", "double")
    wd.append(spark.createDataFrame(
        [(2, (2**40, 2.5))], "k long, s struct<a:long,x:double>"
    ))
    got = sorted(
        (r["k"], (r["s"]["a"], r["s"]["x"]))
        for r in DeltaTableReader(dp).to_df(spark).collect()
    )
    assert got == [(1, (10, 1.5)), (2, (2**40, 2.5))]
    sf = {
        f.name: f
        for f in DeltaTableReader(dp).snapshot()
        .schema["s"].dataType.fields
    }
    assert sf["a"].dataType.simpleString() == "bigint"
    assert (sf["a"].metadata or {})["delta.typeChanges"] == [
        {"fromType": "integer", "toType": "long"}
    ]
    # Iceberg
    ip = str(tmp_path / "i")
    wi = IcebergTableWriter(ip)
    wi.create(spark.createDataFrame(
        [(1, (10, 1.5))], "k long, s struct<a:int,x:float>"
    ))
    wi.widen_column_type("s.a", "bigint")
    wi.append(spark.createDataFrame(
        [(2, (2**40, 2.5))], "k long, s struct<a:long,x:float>"
    ))
    got = sorted(
        (r["k"], r["s"]["a"])
        for r in IcebergTableReader(ip).to_df(spark).collect()
    )
    assert got == [(1, 10), (2, 2**40)]
    meta = IcebergTableReader(ip)._metadata()
    cur = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"]
    )
    s_t = next(f for f in cur["fields"] if f["name"] == "s")["type"]
    a = next(f for f in s_t["fields"] if f["name"] == "a")
    # the nested field keeps its id through the promotion
    old = next(
        f for f in meta["schemas"][0]["fields"] if f["name"] == "s"
    )["type"]["fields"]
    assert a["id"] == next(f for f in old if f["name"] == "a")["id"]
    assert a["type"] == "long"


def test_iceberg_compat_without_uniform_restricts_widening(
    spark, tmp_path
):
    """ADVICE r13: the promotion gate keys on icebergCompat being
    ENABLED, not on universalFormat naming iceberg — the compat
    invariants protect other engines' ability to generate the Iceberg
    view later, so a compat table that is not (yet) UniForm still
    refuses Iceberg-illegal widenings."""
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
                 "delta.columnMapping.physicalName": "col-aaaa",
             }},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {
                 "delta.columnMapping.id": 2,
                 "delta.columnMapping.physicalName": "col-bbbb",
             }},
        ],
    })
    with open(_os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["columnMapping"],
                "writerFeatures": ["columnMapping", "icebergCompatV2"],
            }},
            {"metaData": {
                "id": "compat-no-uniform", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "2",
                    "delta.enableIcebergCompatV2": "true",
                },
                "createdTime": 0,
            }},
        ]:
            f.write(_json.dumps(a) + "\n")
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(DeltaProtocolError, match="Iceberg type"):
        w.widen_column_type("k", "decimal(22,0)")
