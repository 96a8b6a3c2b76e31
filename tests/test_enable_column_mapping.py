"""Enabling columnMapping on an EXISTING table (round 14) — the
delta-spark upgrade flow ``ALTER TABLE … SET TBLPROPERTIES
('delta.columnMapping.mode'='name')``. Before this, RENAME/DROP COLUMN
required mapping but nothing could turn it on for tables this engine
created. The upgrade mints ids with physicalName == current name, so
every committed file (keyed by name) keeps resolving with zero
rewrites; columns added later get fresh ``col-<uuid>`` physical
names."""

import json

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def _mk(spark, tmp_path, name="t"):
    path = str(tmp_path / name)
    t = open_table(path, "delta").create(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "k long, v string, p double"
        )
    )
    return t, path


def test_upgrade_then_rename_then_add(spark, tmp_path):
    t, path = _mk(spark, tmp_path)
    # the previously-impossible flow: rename without mapping fails …
    with pytest.raises(DeltaProtocolError, match="columnMapping"):
        t.rename_column("v", "val")
    # … enable via the SQL property (delta-spark's exact spelling) …
    sql(
        spark,
        "ALTER TABLE t SET TBLPROPERTIES "
        "('delta.columnMapping.mode'='name')",
        tables={"t": t},
    )
    snap = DeltaTableReader(path).snapshot()
    assert snap.configuration["delta.columnMapping.mode"] == "name"
    proto = snap.raw_protocol
    assert proto["minReaderVersion"] >= 2
    assert proto["minWriterVersion"] >= 5
    for f in snap.schema.fields:
        md = f.metadata
        # physical == current name: committed files keep resolving
        assert md["delta.columnMapping.physicalName"] == f.name
        assert md["delta.columnMapping.id"] >= 1
    assert int(snap.configuration["delta.columnMapping.maxColumnId"]) == 3
    # old files read back identically through the mapping
    assert sorted(
        (r["k"], r["v"], r["p"]) for r in t.read(spark).collect()
    ) == [(1, "a", 1.5), (2, "b", 2.5)]
    # … and now rename works, metadata-only
    t.rename_column("v", "val")
    assert sorted(
        (r["k"], r["val"]) for r in t.read(spark).collect()
    ) == [(1, "a"), (2, "b")]
    # a post-upgrade ADD COLUMN gets a fresh uuid physical name
    t.add_column("extra", "int")
    snap = DeltaTableReader(path).snapshot()
    extra = [f for f in snap.schema.fields if f.name == "extra"][0]
    assert extra.metadata[
        "delta.columnMapping.physicalName"
    ].startswith("col-")
    # writes after the upgrade stage under physical names and read back
    t.append(
        spark.createDataFrame([(3, "c", 3.5, 7)],
                              "k long, val string, p double, extra int")
    )
    got = {r["k"]: (r["val"], r["extra"]) for r in t.read(spark).collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", 7)}


def test_mode_transition_rules(spark, tmp_path):
    t, path = _mk(spark, tmp_path)
    w = DeltaTableWriter(path)
    with pytest.raises(DeltaProtocolError, match="'id' mode"):
        w.enable_column_mapping("id")
    v0 = DeltaTableReader(path).snapshot().version
    assert w.enable_column_mapping("none") == v0  # none->none no-op
    w.enable_column_mapping("name")
    v1 = DeltaTableReader(path).snapshot().version
    assert w.enable_column_mapping("name") == v1  # idempotent
    with pytest.raises(DeltaProtocolError, match="cannot change"):
        w.enable_column_mapping("none")  # never disable
    with pytest.raises(DeltaProtocolError, match="cannot change"):
        w.enable_column_mapping("id")


def test_feature_versioned_table_gets_feature_lists(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(
        spark.createDataFrame([(1, 2)], "k long, x long"),
        cluster_by=["x"],  # feature-list protocol (writer v7)
    )
    w.enable_column_mapping("name")
    proto = DeltaTableReader(path).snapshot().raw_protocol
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert "columnMapping" in proto["readerFeatures"]
    assert {"columnMapping", "clusteredTable"} <= set(
        proto["writerFeatures"]
    )
    # the clustering domain's physical paths still resolve (they were
    # recorded pre-upgrade as the then-physical == logical names)
    from aws_glue_data_lake_spark.deltacompat import (
        _clustering_logical_cols,
    )

    assert _clustering_logical_cols(
        DeltaTableReader(path).snapshot()
    ) == ["x"]


def test_nested_fields_get_ids(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(1, {"a": 1, "b": "x"}, [1, 2])],
            "k long, s struct<a:int,b:string>, arr array<int>",
        )
    )
    w.enable_column_mapping("name")
    snap = DeltaTableReader(path).snapshot()
    sch = json.loads(snap.raw_meta["schemaString"])
    s = [f for f in sch["fields"] if f["name"] == "s"][0]
    for nf in s["type"]["fields"]:
        assert "delta.columnMapping.id" in nf["metadata"]
    arr = [f for f in sch["fields"] if f["name"] == "arr"][0]
    # list element position id (icebergCompat's nested-ids obligation)
    assert arr["metadata"].get("parquet.field.nested.ids")
    ids = set()
    from aws_glue_data_lake_spark.deltacompat import _all_mapping_ids

    for i in _all_mapping_ids(sch["fields"]):
        assert i not in ids, f"duplicate mapping id {i}"
        ids.add(i)
    assert int(
        snap.configuration["delta.columnMapping.maxColumnId"]
    ) == max(ids)
    # nested struct reads round-trip through the (identity) mapping
    r = DeltaTableReader(path).to_df(spark).first()
    assert (r["s"]["a"], r["s"]["b"], r["arr"]) == (1, "x", [1, 2])


def test_protocol_bearing_property_routing(spark, tmp_path):
    """set_property matches keys case-insensitively (DeltaConfigs),
    commits the canonical spelling, and ROUTES protocol-bearing
    enables through their upgrade flows instead of landing a naive —
    protocol-invalid — configuration entry."""
    t, path = _mk(spark, tmp_path)
    w = DeltaTableWriter(path)
    w.set_property("DELTA.CHECKPOINTINTERVAL", "5")
    snap = DeltaTableReader(path).snapshot()
    assert snap.configuration["delta.checkpointInterval"] == "5"
    assert "delta.checkpointinterval" not in snap.configuration
    # CDF: lowercased spelling still routes; legacy protocol bumps to
    # writer 4 (the changeDataFeed requirement)
    w.set_property("delta.enablechangedatafeed", "true")
    snap = DeltaTableReader(path).snapshot()
    assert snap.configuration["delta.enableChangeDataFeed"] == "true"
    assert snap.raw_protocol["minWriterVersion"] >= 4
    # ICT: needs the v7 inCommitTimestamp writer feature
    w.set_property("delta.enableInCommitTimestamps", "true")
    snap = DeltaTableReader(path).snapshot()
    assert snap.raw_protocol["minWriterVersion"] == 7
    assert "inCommitTimestamp" in snap.raw_protocol["writerFeatures"]
    # DV: needs the reader+writer deletionVectors features
    w.set_property("delta.enableDeletionVectors", "true")
    snap = DeltaTableReader(path).snapshot()
    assert snap.raw_protocol["minReaderVersion"] == 3
    assert "deletionVectors" in snap.raw_protocol["readerFeatures"]
    assert "deletionVectors" in snap.raw_protocol["writerFeatures"]
    # changeDataFeed survived the feature-list upgrades
    assert "changeDataFeed" in snap.raw_protocol["writerFeatures"]
    # the table still writes and reads under the upgraded protocol
    # (ICT active: commits stamp inCommitTimestamp; CDF active:
    # the append derives its changes)
    t.append(spark.createDataFrame([(3, "c", 3.5)],
                                   "k long, v string, p double"))
    assert t.read(spark).count() == 3
    v = DeltaTableReader(path).snapshot().version
    ch = t.changes(spark, starting_version=v)
    assert ch.where(ch._change_type == "insert").count() == 1
