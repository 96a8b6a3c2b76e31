"""TRUNCATE TABLE (round 14): drop every row in one metadata-only
commit on all three formats — schema/partitioning/properties survive,
prior versions stay time-travelable until vacuum, and on a CDF-enabled
Delta table the feed records explicit row-level deletes."""

import pytest

from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def _mk(spark, tmp_path, fmt):
    t = open_table(str(tmp_path / fmt), fmt).create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ).repartition(2)
    )
    return t


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_truncate_roundtrip(spark, tmp_path, fmt):
    t = _mk(spark, tmp_path, fmt)
    # delta/lake history carries commit versions; iceberg snapshot ids
    pre_tip = (
        t.history()[0]["snapshot_id"]
        if fmt == "iceberg"
        else max(h["version"] for h in t.history())
    )
    sql(spark, "TRUNCATE TABLE t", tables={"t": t})
    got = t.read(spark)
    assert got.count() == 0
    assert got.columns == ["k", "v"]  # schema survives
    # prior version still time-travelable
    assert t.read(spark, version=pre_tip).count() == 3
    # the table keeps working: append lands on the empty state
    t.append(spark.createDataFrame([(9, "z")], "k long, v string"))
    assert [(r["k"], r["v"]) for r in t.read(spark).collect()] == [
        (9, "z")
    ]
    # vacuum collects the truncated files
    assert t.vacuum(keep=1)


def test_delta_truncate_cdf_and_no_op(spark, tmp_path):
    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )

    t = _mk(spark, tmp_path, "delta")
    w = DeltaTableWriter(t.path)
    w.set_property("delta.enableChangeDataFeed", "true")
    with pytest.raises(ValueError, match="SparkSession"):
        w.truncate()  # CDF table refuses a sparkless truncate
    w.truncate(spark)
    v = DeltaTableReader(t.path).snapshot().version
    ch = t.changes(spark, starting_version=v)
    assert sorted(
        (r["k"], r["_change_type"]) for r in ch.collect()
    ) == [(1, "delete"), (2, "delete"), (3, "delete")]
    # empty table: truncate is a no-op, no new commit
    assert w.truncate(spark) == v


def test_iceberg_truncate_preserves_spec_and_properties(
    spark, tmp_path
):
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergTableReader,
        IcebergTableWriter,
    )

    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(1, "a", "x"), (2, "b", "y")], "k long, v string, p string"
        ),
        partition_by=["p"],
    )
    w.truncate()
    r = IcebergTableReader(path)
    snap = r.snapshot()
    assert snap.files == []
    assert tuple(snap.partition_by) == ("p",)  # spec survives
    # appends repartition correctly afterwards
    w.append(spark.createDataFrame(
        [(3, "c", "z")], "k long, v string, p string"
    ))
    got = r.to_df(spark).collect()
    assert [(x["k"], x["p"]) for x in got] == [(3, "z")]
