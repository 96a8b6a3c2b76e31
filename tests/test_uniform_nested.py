"""UniForm with NESTED columns (VERDICT r12 item 1 / round-13
headline): a Delta table with struct/array/map columns and per-element
field ids (nested delta.columnMapping.id on struct fields,
parquet.field.nested.ids for list/map positions) must accept append +
MERGE, with the Delta and Iceberg views reading the same bytes
identically and the synced Iceberg schema carrying ids at every nested
position."""

import json
import os

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)
from aws_glue_data_lake_spark.icebergcompat import IcebergTableReader


def _uniform_nested_table(path: str) -> None:
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {
                 "delta.columnMapping.id": 1,
                 "delta.columnMapping.physicalName": "col-k",
             }},
            {"name": "s", "nullable": True,
             "type": {
                 "type": "struct",
                 "fields": [
                     {"name": "a", "type": "integer", "nullable": True,
                      "metadata": {
                          "delta.columnMapping.id": 3,
                          "delta.columnMapping.physicalName": "a",
                      }},
                     {"name": "b", "type": "string", "nullable": True,
                      "metadata": {
                          "delta.columnMapping.id": 4,
                          "delta.columnMapping.physicalName": "b",
                      }},
                 ],
             },
             "metadata": {
                 "delta.columnMapping.id": 2,
                 "delta.columnMapping.physicalName": "col-s",
             }},
            {"name": "arr", "nullable": True,
             "type": {"type": "array", "elementType": "long",
                      "containsNull": True},
             "metadata": {
                 "delta.columnMapping.id": 5,
                 "delta.columnMapping.physicalName": "col-arr",
                 "parquet.field.nested.ids": {"col-arr.element": 6},
             }},
            {"name": "m", "nullable": True,
             "type": {"type": "map", "keyType": "string",
                      "valueType": "long",
                      "valueContainsNull": True},
             "metadata": {
                 "delta.columnMapping.id": 7,
                 "delta.columnMapping.physicalName": "col-m",
                 "parquet.field.nested.ids": {
                     "col-m.key": 8, "col-m.value": 9
                 },
             }},
        ],
    })
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["columnMapping"],
                "writerFeatures": ["columnMapping",
                                   "icebergCompatV2"],
            }},
            {"metaData": {
                "id": "uniform-nested-test", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.columnMapping.mode": "id",
                    "delta.columnMapping.maxColumnId": "9",
                    "delta.enableIcebergCompatV2": "true",
                    "delta.universalFormat.enabledFormats": "iceberg",
                },
                "createdTime": 0,
            }},
        ]:
            f.write(json.dumps(a) + "\n")


_DDL = (
    "k long, s struct<a:int,b:string>, arr array<long>, "
    "m map<string,long>"
)


def _both(spark, path):
    def norm(rows):
        return sorted(
            (
                r["k"],
                (r["s"]["a"], r["s"]["b"]) if r["s"] else None,
                tuple(r["arr"]) if r["arr"] is not None else None,
                tuple(sorted((r["m"] or {}).items())),
            )
            for r in rows
        )

    return (
        norm(DeltaTableReader(path).to_df(spark).collect()),
        norm(IcebergTableReader(path).to_df(spark).collect()),
    )


def test_uniform_nested_append_and_merge(spark, tmp_path):
    path = str(tmp_path / "t")
    _uniform_nested_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, (10, "x"), [1, 2], {"p": 1}),
         (2, (20, "y"), [], {})],
        _DDL,
    ))
    d, i = _both(spark, path)
    assert d == i == [
        (1, (10, "x"), (1, 2), (("p", 1),)),
        (2, (20, "y"), (), ()),
    ]
    # the synced Iceberg schema carries ids at EVERY nested position
    meta = IcebergTableReader(path)._metadata()
    cur = next(
        sc for sc in meta["schemas"]
        if sc["schema-id"] == meta["current-schema-id"]
    )
    by = {f["name"]: f for f in cur["fields"]}
    assert by["s"]["type"]["fields"][0]["id"] == 3
    assert by["s"]["type"]["fields"][1]["id"] == 4
    assert by["arr"]["type"]["element-id"] == 6
    assert by["m"]["type"]["key-id"] == 8
    assert by["m"]["type"]["value-id"] == 9
    # name mapping emitted for the id-less list/map positions
    nm = json.loads(
        meta["properties"]["schema.name-mapping.default"]
    )
    assert any(e["field-id"] == 6 for top in nm
               for e in top.get("fields", []))
    # MERGE (remove-bearing) keeps the views in lockstep
    w.merge(
        spark,
        spark.createDataFrame(
            [(2, (21, "Y"), [9], {"q": 2}),
             (3, (30, "z"), None, None)],
            _DDL,
        ),
        keys=["k"],
    )
    d, i = _both(spark, path)
    assert d == i == [
        (1, (10, "x"), (1, 2), (("p", 1),)),
        (2, (21, "Y"), (9,), (("q", 2),)),
        (3, (30, "z"), None, ()),
    ]


def test_uniform_nested_file_bytes_carry_struct_ids(spark, tmp_path):
    """icebergCompatV2's obligation: nested STRUCT fields in file bytes
    carry parquet field ids matching the Iceberg schema."""
    import pyarrow.parquet as pq
    import pyarrow as pa

    path = str(tmp_path / "t")
    _uniform_nested_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, (10, "x"), [1], {"p": 1})], _DDL,
    ))
    p = [p for p, _, _ in DeltaTableReader(path).snapshot().files][0]
    sch = pq.ParquetFile(p).schema_arrow
    s_field = sch.field("col-s")
    assert s_field.metadata[b"PARQUET:field_id"] == b"2"
    inner = {
        s_field.type.field(j).name:
            s_field.type.field(j).metadata[b"PARQUET:field_id"]
        for j in range(s_field.type.num_fields)
    }
    assert inner == {"a": b"3", "b": b"4"}


def test_uniform_nested_missing_element_ids_refuses_precommit(
    spark, tmp_path
):
    """A nested column WITHOUT element ids must refuse BEFORE the
    commit (the gate), not after a durable write."""
    path = str(tmp_path / "t")
    _uniform_nested_table(path)
    # strip the array's nested ids
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    actions = [json.loads(l) for l in open(log)]
    sch = json.loads(actions[1]["metaData"]["schemaString"])
    del sch["fields"][2]["metadata"]["parquet.field.nested.ids"]
    actions[1]["metaData"]["schemaString"] = json.dumps(sch)
    with open(log, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    w = DeltaTableWriter(path)
    with pytest.raises(DeltaProtocolError, match="BEFORE the commit"):
        w.append(spark.createDataFrame(
            [(1, (10, "x"), [1], {"p": 1})], _DDL,
        ))
    assert DeltaTableReader(path).snapshot().version == 0


def test_add_column_nested_assigns_ids_and_appends(spark, tmp_path):
    """ADVICE r12 (medium): ADD COLUMN of a nested type under
    columnMapping assigns ids to every nested field/element and
    advances maxColumnId; the UniForm view evolves with a fresh
    schema-id and the new column reads back on both views."""
    path = str(tmp_path / "t")
    _uniform_nested_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, (10, "x"), [1], {"p": 1})], _DDL,
    ))
    meta0 = IcebergTableReader(path)._metadata()
    w.add_column("extra", "struct<c:long, tags:array<string>>")
    snap = DeltaTableReader(path).snapshot()
    f = snap.schema["extra"]
    md = f.metadata
    assert md["delta.columnMapping.id"] == 10
    nested = {
        sf.name: (sf.metadata or {}).get("delta.columnMapping.id")
        for sf in f.dataType.fields
    }
    assert nested == {"c": 11, "tags": 12}
    assert md["parquet.field.nested.ids"] == {
        md["delta.columnMapping.physicalName"] + ".tags.element": 13
    }
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "13"
    w.append(spark.createDataFrame(
        [(2, (20, "y"), [2], {"q": 2}, (7, ["t1"]))],
        _DDL + ", extra struct<c:long, tags:array<string>>",
    ))
    meta1 = IcebergTableReader(path)._metadata()
    assert meta1["current-schema-id"] > meta0["current-schema-id"]
    got_d = sorted(
        (r["k"], (r["extra"]["c"], tuple(r["extra"]["tags"]))
         if r["extra"] else None)
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    got_i = sorted(
        (r["k"], (r["extra"]["c"], tuple(r["extra"]["tags"]))
         if r["extra"] else None)
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got_d == got_i == [(1, None), (2, (7, ("t1",)))]


def test_uniform_nested_rename_refuses_precommit(spark, tmp_path):
    """A nested RENAME leaves physicalName != name, which the
    name-resolved Iceberg view cannot express — the DDL must refuse
    BEFORE its metadata commit (views never diverge)."""
    path = str(tmp_path / "t")
    _uniform_nested_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, (10, "x"), [1], {"p": 1})], _DDL,
    ))
    v_before = DeltaTableReader(path).snapshot().version
    with pytest.raises(DeltaProtocolError, match="BEFORE the commit"):
        w.rename_column("s.a", "a2")
    assert DeltaTableReader(path).snapshot().version == v_before
    # top-level rename is FINE: ids do top-level resolution
    w.rename_column("k", "kk")
    got = sorted(
        r["kk"] for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [1]


def test_uniform_nested_rowtracking_three_clause_merge(
    spark, tmp_path
):
    """The full realistic stack in one table (Databricks' default
    stamps): NESTED schema + UniForm + rowTracking, driven by a
    THREE-CLAUSE merge. Surviving rows keep their stable row ids
    through the CoW rewrite, the NMBS-updated row keeps its id too
    (same entity, new version), and the Delta and Iceberg views agree
    after every commit."""
    import json as _json

    path = str(tmp_path / "t")
    _uniform_nested_table(path)
    # retrofit rowTracking onto the nested fixture's v0 log
    log = os.path.join(path, "_delta_log", f"{0:020d}.json")
    actions = [_json.loads(l) for l in open(log)]
    actions[0]["protocol"]["writerFeatures"] += [
        "rowTracking", "domainMetadata"
    ]
    conf = actions[1]["metaData"]["configuration"]
    conf["delta.columnMapping.mode"] = "name"  # materialized-id gate
    conf["delta.enableRowTracking"] = "true"
    conf["delta.rowTracking.materializedRowIdColumnName"] = \
        "_row_id_mat"
    conf["delta.rowTracking.materializedRowCommitVersionColumnName"] = \
        "_row_ver_mat"
    with open(log, "w") as f:
        for a in actions:
            f.write(_json.dumps(a) + "\n")
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(i, (i * 10, f"s{i}"), [i], {"m": i}) for i in range(6)],
        _DDL,
    ).coalesce(1).sortWithinPartitions("k"))
    r = DeltaTableReader(path)
    before = {
        x["k"]: x["_row_id"] for x in r.row_lineage(spark).collect()
    }
    # three clauses: k=1 matched-replace, k=9 insert, k=4 NMBS-update
    # (s.a flipped negative), k=5 NMBS-delete
    w.merge(
        spark,
        spark.createDataFrame(
            [(1, (99, "S1"), [9], {"m": 9}),
             (9, (90, "s9"), [], {})],
            _DDL,
        ),
        keys=["k"],
        not_matched_by_source="update",
        not_matched_by_source_condition="k = 4",
        not_matched_by_source_set={
            "s": "named_struct('a', -s.a, 'b', s.b)"
        },
    )
    w.merge(
        spark,
        spark.createDataFrame([], _DDL),
        keys=["k"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="k = 5",
    )
    after = {
        x["k"]: x["_row_id"] for x in r.row_lineage(spark).collect()
    }
    assert set(after) == {0, 1, 2, 3, 4, 9}
    # untouched + NMBS-updated rows keep their stable ids
    for k in (0, 2, 3, 4):
        assert after[k] == before[k], (k, before.get(k), after.get(k))
    # the matched-replaced row inherits the old entity's id
    assert after[1] == before[1]
    # fresh insert takes a new id above everything seen
    assert after[9] > max(before.values())
    # NMBS-update applied inside the nested struct; views agree
    d, i = _both(spark, path)
    assert d == i
    assert next(row for row in d if row[0] == 4)[1] == (-40, "s4")
