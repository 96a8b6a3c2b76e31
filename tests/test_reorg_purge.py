"""REORG TABLE ... APPLY (PURGE) (round 14): delta-spark's targeted
rewrite that makes soft deletes physical — DV-bearing files lose their
tombstoned rows, dropped-column remnants (legal under columnMapping)
are rewritten to the current physical schema, and files needing
neither are carried BY REFERENCE (the whole point vs OPTIMIZE at
100 TB). dataChange:false commit; vacuum afterwards collects the
purged bytes."""

import os

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaTableReader,
    DeltaTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table
from pyspark.sql import functions as F


def _paths(path):
    snap = DeltaTableReader(path).snapshot()
    return {os.path.abspath(p) for p, _, _ in snap.files}


def test_purges_dv_files_only(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(
        spark.range(1000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(4, "k")  # only low-range files get DVs
    )
    before = _paths(path)
    assert len(before) == 4
    w.delete_where(spark, "k < 100")  # DVs on some files
    snap = DeltaTableReader(path).snapshot()
    dv_files = {os.path.abspath(p) for p, _, dv in snap.files if dv}
    clean = _paths(path) - dv_files
    assert dv_files and clean  # both kinds present
    v = w.reorg_purge(spark)
    snap2 = DeltaTableReader(path).snapshot()
    assert snap2.version == v
    # clean files carried by reference; DV files replaced
    after = _paths(path)
    assert clean <= after
    assert not (dv_files & after)
    # no DVs remain; rows identical to the logical content
    assert not any(dv for _, _, dv in snap2.files)
    got = DeltaTableReader(path).to_df(spark)
    assert got.count() == 900
    assert got.agg(F.min("k")).first()[0] == 100
    # dataChange:false -> a second REORG is a no-op (no new commit)
    assert w.reorg_purge(spark) == snap2.version
    # vacuum now physically drops the old DV'd files + DV bins
    deleted = open_table(path, "delta").vacuum(keep=1)
    assert any(os.path.abspath(d) in dv_files for d in deleted)


def test_purges_dropped_column_remnants(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0)],
            "k long, v string, secret double",
        )
    )
    w.enable_column_mapping("name")
    w.drop_column("secret")  # metadata-only: bytes remain
    old = _paths(path)
    # append a post-drop file: physically clean, must NOT be rewritten
    t = open_table(path, "delta")
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    clean = _paths(path) - old
    sql(spark, "REORG TABLE t APPLY (PURGE)", tables={"t": t})
    after = _paths(path)
    assert not (old & after), "remnant-bearing files must be rewritten"
    assert clean <= after, "clean files carried by reference"
    assert sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    ) == [(1, "a"), (2, "b"), (3, "c")]
    # the rewritten bytes no longer carry the dropped column
    import pyarrow.parquet as pq

    snap = DeltaTableReader(path).snapshot()
    phys_allowed = set()
    for f in snap.schema.fields:
        phys_allowed.add(DeltaTableReader._physical_name(f))
    for p, _, _ in snap.files:
        names = set(pq.ParquetFile(p).schema_arrow.names)
        assert names <= phys_allowed, (p, names)


def test_reorg_refused_on_other_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, 2)], "k long, v long")
    for fmt in ("iceberg", "lake"):
        t = open_table(str(tmp_path / fmt), fmt).create(df)
        with pytest.raises(NotImplementedError, match="Delta command"):
            t.reorg_purge(spark)
