"""Writer feature allowColumnDefaults (Delta PROTOCOL.md § Default
Columns) + the targeted coordinated-commits refusal.

A defaulted column (CURRENT_DEFAULT field metadata) absent from an
incoming batch must be FILLED with its default expression on every
INSERT-shaped write (append / MERGE insert / partition overwrite); a
present column — including explicit NULL — must never be touched. The
feature previously sat outside _SUPPORTED_WRITER_FEATURES, so any table
where someone ran ALTER COLUMN ... SET DEFAULT refused all writes
(VERDICT r11 missing-item 1)."""

import json
import os

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaProtocolError,
    DeltaTableReader,
    DeltaTableWriter,
)


def _foreign_defaults_table(path: str) -> None:
    """v0 log in the FOREIGN shape a defaults-enabling writer leaves:
    allowColumnDefaults in the feature list, CURRENT_DEFAULT on two
    fields (a literal and a non-trivial expression)."""
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "status", "type": "string", "nullable": True,
             "metadata": {"CURRENT_DEFAULT": "'active'"}},
            {"name": "score", "type": "long", "nullable": True,
             "metadata": {"CURRENT_DEFAULT": "10 * 2 + 2"}},
        ],
    })
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["appendOnly", "invariants",
                                   "allowColumnDefaults"],
            }},
            {"metaData": {
                "id": "defaults-test", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [], "configuration": {},
                "createdTime": 0,
            }},
        ]:
            f.write(json.dumps(a) + "\n")


def test_append_fills_absent_defaulted_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    _foreign_defaults_table(path)
    w = DeltaTableWriter(path)
    # batch carries NEITHER defaulted column -> both filled
    w.append(spark.createDataFrame([(1,), (2,)], "k long"))
    got = {
        r["k"]: (r["status"], r["score"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    }
    assert got == {1: ("active", 22), 2: ("active", 22)}


def test_present_column_never_overwritten(spark, tmp_path):
    path = str(tmp_path / "t")
    _foreign_defaults_table(path)
    w = DeltaTableWriter(path)
    # explicit NULL is a VALUE under the spec — the default must not
    # replace it; explicit non-NULL obviously kept
    w.append(spark.createDataFrame(
        [(1, None), (2, "archived")], "k long, status string"
    ))
    got = {
        r["k"]: (r["status"], r["score"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    }
    assert got == {1: (None, 22), 2: ("archived", 22)}


def test_merge_insert_fills_defaults(spark, tmp_path):
    path = str(tmp_path / "t")
    _foreign_defaults_table(path)
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, "old", 5)], "k long, status string, score long"
    ))
    w.merge(
        spark,
        spark.createDataFrame([(1,), (9,)], "k long"),
        keys=["k"],
    )
    got = {
        r["k"]: (r["status"], r["score"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    }
    # matched key 1 is REPLACED by the source row (this engine's
    # full-row merge), whose absent columns took the defaults; new key
    # 9 inserts with defaults
    assert got == {1: ("active", 22), 9: ("active", 22)}


def test_set_default_ddl_roundtrip(spark, tmp_path):
    from aws_glue_data_lake_spark.sqlfront import sql
    from aws_glue_data_lake_spark.table import open_table

    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "x")], "k long, status string"
    ))
    t = open_table(path, "delta")
    sql(
        spark,
        f"ALTER TABLE t ALTER COLUMN status SET DEFAULT 'pending'",
        tables={"t": t},
    )
    snap = DeltaTableReader(path).snapshot()
    assert "allowColumnDefaults" in (
        snap.raw_protocol or {}).get("writerFeatures", [])
    assert snap.schema["status"].metadata["CURRENT_DEFAULT"] == \
        "'pending'"
    w.append(spark.createDataFrame([(2,)], "k long"))
    got = {
        r["k"]: r["status"]
        for r in DeltaTableReader(path).to_df(spark).collect()
    }
    assert got == {1: "x", 2: "pending"}
    # defaults only on EXISTING columns (the spec disallows
    # ADD COLUMN ... DEFAULT) — unknown column refuses
    with pytest.raises(ValueError, match="no column"):
        w.set_column_default("nope", "'x'")
    # malformed expression refuses at DDL time, not at the next write
    with pytest.raises(Exception):
        w.set_column_default("status", "not ((((valid")


def test_coordinated_commits_targeted_refusal(spark, tmp_path):
    """catalogOwned / coordinatedCommits tables cannot be committed to
    by a filesystem writer at all — the refusal must NAME the
    coordinator requirement, not just report an unknown feature."""
    path = str(tmp_path / "t")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema_string = json.dumps({
        "type": "struct",
        "fields": [{"name": "k", "type": "long", "nullable": True,
                    "metadata": {}}],
    })
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": [],
                "writerFeatures": ["coordinatedCommits"],
            }},
            {"metaData": {
                "id": "cc-test", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [],
                "configuration": {
                    "delta.coordinatedCommits.commitCoordinator-preview":
                        "acme-coordinator",
                },
                "createdTime": 0,
            }},
        ]:
            f.write(json.dumps(a) + "\n")
    with pytest.raises(DeltaProtocolError) as ei:
        DeltaTableWriter(path).append(
            spark.createDataFrame([(1,)], "k long")
        )
    msg = str(ei.value)
    assert "commit coordinator" in msg and "'acme-coordinator'" in msg
    # reads of the published filesystem tail stay valid
    assert DeltaTableReader(path).to_df(spark).count() == 0
