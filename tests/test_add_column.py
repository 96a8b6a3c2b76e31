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


def _mapped_table(path: str) -> None:
    """FOREIGN id-mode columnMapping table, empty, 3 columns."""
    import json as _json
    import os as _os

    log = _os.path.join(path, "_delta_log")
    _os.makedirs(log)
    schema_string = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": True,
             "metadata": {
                 "delta.columnMapping.id": i + 1,
                 "delta.columnMapping.physicalName": f"col-{i + 1}",
             }}
            for i, (n, t) in enumerate(
                [("k", "long"), ("v", "string"), ("x", "long")]
            )
        ],
    })
    with open(_os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["columnMapping"],
                "writerFeatures": ["columnMapping",
                                   "checkConstraints"],
            }},
            {"metaData": {
                "id": "t", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "3",
                },
                "createdTime": 0,
            }},
        ]:
            f.write(_json.dumps(a) + "\n")


def test_delta_rename_and_drop_column(spark, tmp_path):
    """RENAME keeps physicalName/id so committed files read unchanged
    under the new logical name; DROP stops projecting the field while
    the physical bytes stay; both are metadata-only commits."""
    path = str(tmp_path / "t")
    _mapped_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, v string, x long"
    ))
    t = open_table(path, "delta")
    sql(spark, "ALTER TABLE t RENAME COLUMN v TO label",
        tables={"t": t})
    got = sorted(
        (r["k"], r["label"], r["x"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, "a", 10), (2, "b", 20)]
    # physicalName survived the rename (files untouched)
    snap = DeltaTableReader(path).snapshot()
    assert snap.schema["label"].metadata[
        "delta.columnMapping.physicalName"] == "col-2"
    sql(spark, "ALTER TABLE t DROP COLUMN x", tables={"t": t})
    df = DeltaTableReader(path).to_df(spark)
    assert df.columns == ["k", "label"]
    assert sorted((r["k"], r["label"]) for r in df.collect()) == [
        (1, "a"), (2, "b")
    ]
    # appends after the evolution land correctly
    w.append(spark.createDataFrame([(3, "c")], "k long, label string"))
    assert DeltaTableReader(path).to_df(spark).count() == 3
    with pytest.raises(ValueError, match="already exists"):
        w.rename_column("k", "label")
    w.drop_column("k")
    with pytest.raises(ValueError, match="last field"):
        w.drop_column("label")


def test_delta_rename_drop_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    # no columnMapping -> refuse (old files would misread)
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        w.rename_column("v", "w")
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        w.drop_column("v")
    # constraint-referenced column refuses rename/drop under mapping
    path2 = str(tmp_path / "t2")
    _mapped_table(path2)
    w2 = DeltaTableWriter(path2)
    w2.set_constraint("pos", "x > 0")
    with pytest.raises(ValueError, match="constraint"):
        w2.drop_column("x")
    with pytest.raises(ValueError, match="constraint"):
        w2.rename_column("x", "y")


def test_iceberg_rename_and_drop_column(spark, tmp_path):
    path = str(tmp_path / "t")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", 10)], "k long, v string, x long"
    ))
    t = open_table(path, "iceberg")
    sql(spark, "ALTER TABLE t RENAME COLUMN v TO label",
        tables={"t": t})
    got = IcebergTableReader(path).to_df(spark).collect()
    assert sorted((r["k"], r["label"], r["x"]) for r in got) == [
        (1, "a", 10)
    ]
    # field id survived the rename
    meta = IcebergTableReader(path)._metadata()
    cur = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"]
    )
    assert next(
        f["id"] for f in cur["fields"] if f["name"] == "label"
    ) == 2
    sql(spark, "ALTER TABLE t DROP COLUMN x", tables={"t": t})
    df = IcebergTableReader(path).to_df(spark)
    assert df.columns == ["k", "label"]
    # a partition-source column refuses to drop
    path2 = str(tmp_path / "p")
    w2 = IcebergTableWriter(path2)
    w2.create(
        spark.createDataFrame([(1, "a")], "k long, part string"),
        partition_by=["part"],
    )
    with pytest.raises(ValueError, match="partition spec"):
        w2.drop_column("part")


def test_sql_add_column_parameterized_type(spark, tmp_path):
    """ADVICE r12: 'ADD COLUMN c DECIMAL(10,2)' must keep the type's
    own parens (the old regex clipped the closing one), and the
    wrapped 'ADD COLUMNS (c DECIMAL(10,2))' form must match at all."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    t = open_table(path, "delta")
    sql(spark, "ALTER TABLE t ADD COLUMN price DECIMAL(10,2)",
        tables={"t": t})
    sql(spark, "ALTER TABLE t ADD COLUMNS (tag VARCHAR(8))",
        tables={"t": t})
    sch = dict(
        (f.name, f.dataType.simpleString())
        for f in DeltaTableReader(path).snapshot().schema.fields
    )
    assert sch["price"] == "decimal(10,2)"
    # VARCHAR normalizes to string — Spark/delta-spark's table-schema
    # convention (preserveCharVarcharTypeInfo is false)
    assert sch["tag"] == "string"
    from decimal import Decimal

    w.append(spark.createDataFrame(
        [(2, "b", Decimal("3.50"), "x")],
        "k long, v string, price decimal(10,2), tag string",
    ))
    got = sorted(
        (r["k"], r["price"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, None), (2, Decimal("3.50"))]


def test_delta_nested_field_ddl(spark, tmp_path):
    """Dotted-path DDL (round 13): ADD/RENAME/DROP a struct subfield on
    a columnMapping table — metadata-only; committed files read
    unchanged through the rename (physicalName pins the bytes)."""
    import json as _json
    import os as _os

    path = str(tmp_path / "t")
    # mapped table with a struct column, nested ids stamped
    log = _os.path.join(path, "_delta_log")
    _os.makedirs(log)
    schema_string = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-k"}},
            {"name": "s", "nullable": True,
             "type": {"type": "struct", "fields": [
                 {"name": "a", "type": "integer", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 3,
                               "delta.columnMapping.physicalName": "a"}},
                 {"name": "b", "type": "string", "nullable": True,
                  "metadata": {"delta.columnMapping.id": 4,
                               "delta.columnMapping.physicalName": "b"}},
             ]},
             "metadata": {"delta.columnMapping.id": 2,
                          "delta.columnMapping.physicalName": "col-s"}},
        ],
    })
    with open(_os.path.join(log, f"{0:020d}.json"), "w") as fh:
        for a in [
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["columnMapping"],
                          "writerFeatures": ["columnMapping"]}},
            {"metaData": {"id": "nested-ddl-test",
                          "format": {"provider": "parquet",
                                     "options": {}},
                          "schemaString": schema_string,
                          "partitionColumns": [],
                          "configuration": {
                              "delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "4"},
                          "createdTime": 0}},
        ]:
            fh.write(_json.dumps(a) + "\n")
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, (10, "x"))], "k long, s struct<a:int,b:string>"
    ))
    t = open_table(path, "delta")
    # nested ADD: old rows read NULL for s.c
    sql(spark, "ALTER TABLE t ADD COLUMN s.c bigint", tables={"t": t})
    # nested RENAME: logical only; the committed file's bytes resolve
    # through the pinned physicalName 'a'
    sql(spark, "ALTER TABLE t RENAME COLUMN s.a TO a2", tables={"t": t})
    snap = DeltaTableReader(path).snapshot()
    s_fields = {f.name: f for f in snap.schema["s"].dataType.fields}
    assert set(s_fields) == {"a2", "b", "c"}
    assert s_fields["a2"].metadata[
        "delta.columnMapping.physicalName"] == "a"
    assert s_fields["c"].metadata["delta.columnMapping.id"] == 5
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "5"
    w.append(spark.createDataFrame(
        [(2, (20, "y", 7))], "k long, s struct<a2:int,b:string,c:long>"
    ))
    got = sorted(
        (r["k"], (r["s"]["a2"], r["s"]["b"], r["s"]["c"]))
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, (10, "x", None)), (2, (20, "y", 7))]
    # nested DROP: bytes stay, never projected
    sql(spark, "ALTER TABLE t DROP COLUMN s.b", tables={"t": t})
    got = sorted(
        (r["k"], tuple(r["s"].asDict().items()))
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [
        (1, (("a2", 10), ("c", None))),
        (2, (("a2", 20), ("c", 7))),
    ]
    with pytest.raises(ValueError, match="not a struct"):
        w.add_column("k.x", "int")


def test_iceberg_nested_column_types_roundtrip(spark, tmp_path):
    """Native Iceberg writer: struct/array/map columns get per-element
    field ids at create and through merge_schema evolution."""
    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, (10, "x"), [1, 2], {"p": 1})],
        "k long, s struct<a:int,b:string>, arr array<long>, "
        "m map<string,long>",
    ))
    meta = IcebergTableReader(path)._metadata()
    cur = meta["schemas"][0]
    by = {f["name"]: f for f in cur["fields"]}
    ids = set()

    def collect(t):
        if isinstance(t, dict) and t.get("type") == "struct":
            for f in t["fields"]:
                ids.add(f["id"])
                collect(f["type"])
        elif isinstance(t, dict) and t.get("type") == "list":
            ids.add(t["element-id"])
            collect(t["element"])
        elif isinstance(t, dict) and t.get("type") == "map":
            ids.add(t["key-id"])
            ids.add(t["value-id"])
            collect(t["key"])
            collect(t["value"])

    collect({"type": "struct", "fields": cur["fields"]})
    assert len(ids) == 9 and meta["last-column-id"] == 9
    assert by["s"]["type"]["fields"][0]["id"] != by["arr"]["type"][
        "element-id"]
    got = sorted(
        (r["k"], (r["s"]["a"], r["s"]["b"]), tuple(r["arr"]),
         tuple(sorted(r["m"].items())))
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, (10, "x"), (1, 2), (("p", 1),))]


def test_iceberg_nested_add_and_drop(spark, tmp_path):
    """Iceberg nested DDL: ADD/DROP a struct subfield via dotted path —
    new schema-id, fresh/retired nested ids; old files null-fill the
    added subfield. Nested RENAME refuses loudly (this engine's staged
    files resolve nested fields by name)."""
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergProtocolError,
    )

    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, (10, "x"))], "k long, s struct<a:int,b:string>"
    ))
    w.add_column("s.c", "bigint")
    w.append(spark.createDataFrame(
        [(2, (20, "y", 7))], "k long, s struct<a:int,b:string,c:long>"
    ))
    got = sorted(
        (r["k"], (r["s"]["a"], r["s"]["c"]))
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, (10, None)), (2, (20, 7))]
    meta = IcebergTableReader(path)._metadata()
    cur = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"]
    )
    s_t = next(f for f in cur["fields"] if f["name"] == "s")["type"]
    ids = [f["id"] for f in s_t["fields"]]
    assert len(set(ids)) == 3 and max(ids) == meta["last-column-id"]
    w.drop_column("s.b")
    got = sorted(
        (r["k"], tuple(r["s"].asDict()))
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, ("a", "c")), (2, ("a", "c"))]
    with pytest.raises(IcebergProtocolError, match="nested renames"):
        w.rename_column("s.a", "a2")


def test_merge_schema_under_column_mapping(spark, tmp_path):
    """mergeSchema on a columnMapping table (round 13; previously
    refused on merge and spec-invalid on append): evolved columns get
    fresh mapping ids/physicalNames IN THE SAME COMMIT, file bytes land
    under the physical names + field ids, old rows read NULL."""
    path = str(tmp_path / "t")
    _mapped_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, "a", 10)], "k long, v string, x long"
    ))
    # append-side evolution
    w.append(
        spark.createDataFrame(
            [(2, "b", 20, 2.5)], "k long, v string, x long, score double"
        ),
        merge_schema=True,
    )
    snap = DeltaTableReader(path).snapshot()
    md = snap.schema["score"].metadata
    assert md["delta.columnMapping.id"] == 4
    assert md["delta.columnMapping.physicalName"].startswith("col-")
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "4"
    got = sorted(
        (r["k"], r["score"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, None), (2, 2.5)]
    # merge-side evolution (was a hard refusal): nested type too
    w.merge(
        spark,
        spark.createDataFrame(
            [(2, "B", 21, 3.5, (1, "t"))],
            "k long, v string, x long, score double, "
            "info struct<n:int,s:string>",
        ),
        keys=["k"],
        merge_schema=True,
    )
    snap = DeltaTableReader(path).snapshot()
    info = snap.schema["info"]
    assert info.metadata["delta.columnMapping.id"] == 5
    nested_ids = {
        f.name: (f.metadata or {}).get("delta.columnMapping.id")
        for f in info.dataType.fields
    }
    assert nested_ids == {"n": 6, "s": 7}
    got = sorted(
        (r["k"], r["score"], (r["info"]["n"], r["info"]["s"])
         if r["info"] else None)
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, None, None), (2, 3.5, (1, "t"))]
