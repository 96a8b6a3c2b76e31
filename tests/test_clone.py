"""SHALLOW CLONE on real Delta tables (VERDICT r13 item 1):
``DeltaTableWriter.clone_from`` + ``Table.clone_to`` +
``CREATE TABLE ... SHALLOW CLONE`` through the SQL front door — one
metadata-only commit referencing the source's live files by absolute
URI (the same mechanism export_lake_snapshot uses; the reader's
raw-path handling already resolves it), then full two-way divergence
isolation, DV carry, VERSION AS OF, and vacuum root-confinement."""

import glob
import os

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaTableReader,
    DeltaTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def _rows(spark, path):
    return sorted(
        (r["k"], r["v"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )


def _data_files(root):
    return {
        os.path.abspath(p)
        for p in glob.glob(os.path.join(root, "**", "*.parquet"),
                           recursive=True)
        if os.sep + "_delta_log" + os.sep not in p
    }


def test_clone_is_metadata_only_and_reads_equal(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    w = DeltaTableWriter(src)
    w.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ).repartition(2)
    )
    DeltaTableWriter(dst).clone_from(src)
    assert _data_files(dst) == set(), "clone must move zero data bytes"
    assert _rows(spark, dst) == _rows(spark, src)
    snap = DeltaTableReader(dst).snapshot()
    # fresh table id, carried schema/stats, absolute raw paths
    assert snap.raw_meta["id"] != DeltaTableReader(src).snapshot() \
        .raw_meta["id"]
    assert all(raw.startswith("file://")
               for raw in snap.raw_paths.values())
    assert snap.stats, "per-file stats must carry for data skipping"
    with pytest.raises(FileExistsError):
        DeltaTableWriter(dst).clone_from(src)


def test_clone_divergence_both_ways_and_raw_key_removes(
    spark, tmp_path
):
    """Writes on the clone remove CARRIED (absolute-URI) files under
    their raw key — no row duplication — and never reach the source;
    source writes never reach the clone."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    w = DeltaTableWriter(src)
    w.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c"), (4, "d")], "k long, v string"
        ).repartition(2)
    )
    DeltaTableWriter(dst).clone_from(src)
    cw = DeltaTableWriter(dst)
    # CoW-style merge rewrites a carried file: the remove must use the
    # raw absolute key or the carried rows would duplicate
    cw.merge(
        spark,
        spark.createDataFrame([(2, "B"), (9, "i")], "k long, v string"),
        keys=["k"],
    )
    cw.delete_where(spark, "k = 4")
    DeltaTableWriter(src).merge(
        spark,
        spark.createDataFrame([(3, "CCC")], "k long, v string"),
        keys=["k"],
    )
    assert _rows(spark, dst) == [(1, "a"), (2, "B"), (3, "c"), (9, "i")]
    assert _rows(spark, src) == [(1, "a"), (2, "b"), (3, "CCC"), (4, "d")]


def test_clone_carries_deletion_vectors_rebased(spark, tmp_path):
    """A source DV (storageType 'u', root-relative) carries as an
    absolute-path 'p' descriptor — the clone subtracts the same dead
    rows without owning the bin."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    w = DeltaTableWriter(src)
    w.create(spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    ).coalesce(1))
    w.delete_where(spark, "k = 2")  # DV tombstone
    DeltaTableWriter(dst).clone_from(src)
    snap = DeltaTableReader(dst).snapshot()
    (dv,) = [dv for _p, _pv, dv in snap.files if dv]
    assert dv["storageType"] == "p"
    assert os.path.isabs(dv["pathOrInlineDv"])
    assert _rows(spark, dst) == [(1, "a"), (3, "c")]


def test_clone_version_as_of(spark, tmp_path):
    src = str(tmp_path / "src")
    w = DeltaTableWriter(src)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    w.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    d0 = str(tmp_path / "d0")
    DeltaTableWriter(d0).clone_from(src, version=0)
    assert _rows(spark, d0) == [(1, "a")]
    with pytest.raises(ValueError, match="not both"):
        DeltaTableWriter(str(tmp_path / "dx")).clone_from(
            src, version=0, timestamp_ms=1
        )


def test_clone_vacuum_confined_to_own_root(spark, tmp_path):
    """vacuum on the clone never deletes source-root files (absolute
    foreign references are outside its glob); vacuum on the source
    never deletes clone-local files."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    w = DeltaTableWriter(src)
    w.create(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).coalesce(1))
    DeltaTableWriter(dst).clone_from(src)
    cw = DeltaTableWriter(dst)
    cw.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    cw.delete_where(spark, "k = 3")  # make a clone-local dead file
    cw.optimize(spark)  # folds DVs, rewrites → carried files now dead IN THE CLONE
    src_before = _data_files(src)
    removed = cw.vacuum(keep_versions=1)
    assert all(os.path.abspath(p).startswith(os.path.abspath(dst))
               for p in removed)
    assert _data_files(src) == src_before
    removed_src = DeltaTableWriter(src).vacuum(keep_versions=1)
    assert removed_src == []
    assert _rows(spark, src) == [(1, "a"), (2, "b")]


def test_clone_sql_front_door_and_facade(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    t = open_table(src, "delta").create(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    )
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    sql(
        spark,
        f"CREATE TABLE delta.`{dst}` SHALLOW CLONE delta.`{src}` "
        "VERSION AS OF 0",
    )
    assert _rows(spark, dst) == [(1, "a"), (2, "b")]
    # IF NOT EXISTS tolerates the existing clone
    sql(
        spark,
        f"CREATE TABLE IF NOT EXISTS delta.`{dst}` "
        f"SHALLOW CLONE delta.`{src}`",
    )
    assert _rows(spark, dst) == [(1, "a"), (2, "b")]
    with pytest.raises(FileExistsError):
        sql(spark, f"CREATE TABLE delta.`{dst}` "
                   f"SHALLOW CLONE delta.`{src}`")
    with pytest.raises(ValueError, match="must match"):
        sql(spark, f"CREATE TABLE lake.`{tmp_path}/x` "
                   f"SHALLOW CLONE delta.`{src}`")
    # facade: lake clones too; iceberg refuses loudly
    with pytest.raises(NotImplementedError, match="CLONE"):
        open_table(str(tmp_path / "i"), "iceberg").clone_to(
            str(tmp_path / "i2")
        )
    # the CLONE commit is visible in history as its own operation
    ops = [h["operation"] for h in open_table(dst, "delta").history()]
    assert "CLONE" in ops


def test_clone_carries_row_tracking_ids(spark, tmp_path):
    """A row-tracked source clones with baseRowId /
    defaultRowCommitVersion intact, so stable row ids survive the
    fork, and the high-water-mark domain carries so the clone's own
    appends never collide."""
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    w = DeltaTableWriter(src)
    w.create(spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    ).coalesce(1))
    w.set_row_tracking()
    w.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    src_ids = {
        r["k"]: r["_row_id"]
        for r in DeltaTableReader(src).row_lineage(spark).collect()
    }
    DeltaTableWriter(dst).clone_from(src)
    cw = DeltaTableWriter(dst)
    cw.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    got = {
        r["k"]: r["_row_id"]
        for r in DeltaTableReader(dst).row_lineage(spark).collect()
    }
    for k, rid in src_ids.items():
        assert got[k] == rid, f"carried row {k} changed id"
    assert got[4] not in set(src_ids.values()), (
        "clone-local append reused a carried row id"
    )
