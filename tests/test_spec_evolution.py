"""Iceberg PARTITION SPEC EVOLUTION (round 13): ADD/DROP PARTITION
FIELD as metadata-only commits — no data rewrite; files committed under
older specs stay readable (their manifests carry their spec-id, and
pruning resolves each file under its OWN spec); new writes partition by
the new default spec; compact() migrates everything forward."""

import pytest

from aws_glue_data_lake_spark.icebergcompat import (
    IcebergProtocolError,
    IcebergTableReader,
    IcebergTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def _rows(spark, path, **kw):
    return sorted(
        (r["k"], r["part"], r["v"])
        for r in IcebergTableReader(path).to_df(spark, **kw).collect()
    )


def test_spec_evolution_add_field_and_mixed_reads(spark, tmp_path):
    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(1, 0, "a"), (2, 1, "b")], "k long, part long, v string"
        ),
        partition_by=["part"],
    )
    t = open_table(path, "iceberg")
    sql(spark, "ALTER TABLE t ADD PARTITION FIELD bucket(4, k)",
        tables={"t": t})
    meta = IcebergTableReader(path)._metadata()
    assert meta["default-spec-id"] == 1
    specs = {s["spec-id"]: s for s in meta["partition-specs"]}
    assert [f["name"] for f in specs[1]["fields"]] == [
        "part", "k_bucket"
    ]
    # the carried field keeps its field-id; the NEW field gets a fresh
    # one past every id any spec ever used
    assert [f["field-id"] for f in specs[1]["fields"]] == [1000, 1001]
    assert [f["field-id"] for f in specs[0]["fields"]] == [1000]
    assert meta["last-partition-id"] == 1001
    # new write partitions under the NEW spec; old files stay readable
    w.append(spark.createDataFrame(
        [(3, 0, "c"), (4, 1, "d")], "k long, part long, v string"
    ))
    assert _rows(spark, path) == [
        (1, 0, "a"), (2, 1, "b"), (3, 0, "c"), (4, 1, "d")
    ]
    # pruning on the shared source column applies to BOTH generations
    assert _rows(spark, path, partition_filter={"part": 0}) == [
        (1, 0, "a"), (3, 0, "c")
    ]
    # pruning on the NEW source: old-spec files have no k field, so
    # the key is enforced EXACTLY as a residual row predicate — no
    # rows with k != 3 leak back (ADVICE r13: Delta/lake
    # partition_filter are exact; an evolved Iceberg read must not
    # silently return non-matching rows)
    got = _rows(spark, path, partition_filter={"k": 3})
    assert got == [(3, 0, "c")]
    # MERGE / eq-deletes still work across the evolution
    w.merge(
        spark.createDataFrame([(2, 1, "B")], "k long, part long, v string"),
        keys=["k"],
    )
    assert _rows(spark, path)[1] == (2, 1, "B")


def test_spec_evolution_drop_field_and_compact_migrates(
    spark, tmp_path
):
    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(1, 0, "a"), (2, 1, "b")], "k long, part long, v string"
        ),
        partition_by=["part"],
    )
    t = open_table(path, "iceberg")
    sql(spark, "ALTER TABLE t DROP PARTITION FIELD part",
        tables={"t": t})
    meta = IcebergTableReader(path)._metadata()
    assert meta["default-spec-id"] == 1
    assert meta["partition-specs"][1]["fields"] == []
    w.append(spark.createDataFrame(
        [(3, 2, "c")], "k long, part long, v string"
    ))
    assert _rows(spark, path) == [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")]
    # overwrite_partition across generations refuses until compaction
    with pytest.raises(IcebergProtocolError, match="spec"):
        w.overwrite_partition(
            spark.createDataFrame([(9, 0, "z")],
                                  "k long, part long, v string"),
        )
    w.compact(spark)
    snap = IcebergTableReader(path).snapshot()
    # every live file now sits under the current (empty) spec
    assert set(snap.file_specs.values()) == {1}
    assert _rows(spark, path) == [(1, 0, "a"), (2, 1, "b"), (3, 2, "c")]


def test_spec_evolution_validation(spark, tmp_path):
    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame([(1, "a")], "k long, v string"))
    with pytest.raises(ValueError, match="no column"):
        w.add_partition_field("nope")
    with pytest.raises(IcebergProtocolError, match="unknown"):
        w.add_partition_field("k", transform="zigzag")
    with pytest.raises(ValueError, match="no spec field"):
        w.remove_partition_field("nope")
    w.add_partition_field("k", transform="bucket[8]")
    with pytest.raises(ValueError, match="already exists"):
        w.add_partition_field("k", transform="bucket[8]")
