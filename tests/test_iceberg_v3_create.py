"""Native Iceberg v3 table creation (VERDICT r13 item 5):
``create(format_version=3)`` initializes ``next-row-id`` and v3
manifest lineage fields so the existing v3 machinery (row lineage,
puffin deletion vectors, changelog) runs end-to-end on SELF-CREATED
tables, not only on foreign fixtures."""

import pytest

from aws_glue_data_lake_spark.icebergcompat import (
    IcebergTableReader,
    IcebergTableWriter,
)


def test_v3_create_initializes_lineage_and_next_row_id(
    spark, tmp_path
):
    path = str(tmp_path / "t")
    w = IcebergTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ).coalesce(1),
        format_version=3,
    )
    r = IcebergTableReader(path)
    meta = r._metadata()
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 3
    (snap0,) = meta["snapshots"]
    assert snap0["first-row-id"] == 0 and snap0["added-rows"] == 3
    ids0 = {
        x["k"]: x["_row_id"] for x in r.row_lineage(spark).collect()
    }
    assert sorted(ids0.values()) == [0, 1, 2]
    # append: fresh ids continue from next-row-id; existing rows stable
    w.append(spark.createDataFrame([(4, "d")], "k long, v string"))
    meta = IcebergTableReader(path)._metadata()
    assert meta["next-row-id"] == 4
    ids1 = {
        x["k"]: x["_row_id"]
        for x in IcebergTableReader(path).row_lineage(spark).collect()
    }
    for k, rid in ids0.items():
        assert ids1[k] == rid, f"row {k} changed lineage id"
    assert ids1[4] == 3


def test_v3_create_dv_delete_and_changelog_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    w = IcebergTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(10)], "k long, v string"
        ).coalesce(1),
        format_version=3,
    )
    # v3 DELETE routes through puffin deletion vectors
    w.delete_where(spark, "k % 3 = 0")
    r = IcebergTableReader(path)
    snap = r.snapshot()
    assert snap.dv_deletes, "v3 delete must produce puffin DVs"
    got = sorted(x["k"] for x in r.to_df(spark).collect())
    assert got == [k for k in range(10) if k % 3 != 0]
    # lineage ids of survivors unchanged by the MoR delete
    ids = {x["k"]: x["_row_id"] for x in r.row_lineage(spark).collect()}
    assert ids == {k: k for k in range(10) if k % 3 != 0}
    # changelog replays insert then MoR-derived deletes exactly
    ch = sorted(
        (x["_change_type"], x["k"])
        for x in r.changes(spark).collect()
    )
    assert ch == sorted(
        [("insert", k) for k in range(10)]
        + [("delete", k) for k in range(10) if k % 3 == 0]
    )


def test_v3_create_rejects_bad_version(spark, tmp_path):
    w = IcebergTableWriter(str(tmp_path / "t"))
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(Exception, match="format-version|format_version"):
        w.create(df, format_version=4)
