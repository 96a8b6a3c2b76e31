"""OPTIMIZE ... ZORDER BY (round 13): multi-dimensional clustering —
the rewrite's files get TIGHT min/max stats on every z-order column at
once, so point/range predicates on ANY of them prune files; rows are
bit-identical to before (dataChange: false commit)."""

import json

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaTableReader,
    DeltaTableWriter,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table
from pyspark.sql import functions as F


def _stats_ranges(path, col):
    snap = DeltaTableReader(path).snapshot()
    out = []
    for p, _, _ in snap.files:
        st = (snap.stats or {}).get(p) or {}
        lo = (st.get("minValues") or {}).get(col)
        hi = (st.get("maxValues") or {}).get(col)
        if lo is not None:
            out.append((lo, hi))
    return out


def _files_containing(path, col, v):
    return sum(1 for lo, hi in _stats_ranges(path, col)
               if lo <= v <= hi)


def test_zorder_tightens_stats_on_both_dimensions(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    # x and y are independently scrambled: before z-ordering, every
    # file's [min,max] spans nearly the whole domain on both columns
    n = 4096
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % n).alias("x"),
            ((F.col("id") * 40503) % n).alias("y"),
        )
        .repartition(8)
    )
    w.create(df)
    before_x = _files_containing(path, "x", 123)
    before_y = _files_containing(path, "y", 456)
    w.optimize(spark, target_files=16, zorder_by=["x", "y"])
    # rows identical, commit is layout-only
    got = DeltaTableReader(path).to_df(spark)
    assert got.count() == n
    assert got.agg(F.sum("x"), F.sum("y")).first() == (
        df.agg(F.sum("x"), F.sum("y")).first()
    )
    snap = DeltaTableReader(path).snapshot()
    assert len(snap.files) == 16
    after_x = _files_containing(path, "x", 123)
    after_y = _files_containing(path, "y", 456)
    # before: every file's range contained the probe on both columns;
    # after: BOTH dimensions prune at least half the files (the whole
    # point of interleaved clustering — one dimension alone could get
    # this from a plain sort, two cannot)
    assert before_x >= 8 and before_y >= 8
    assert after_x <= 8 and after_y <= 8
    # the SQL spelling routes too (re-cluster on one column: plain
    # range sort, x-ranges now near-disjoint)
    t = open_table(path, "delta")
    sql(spark, "OPTIMIZE t ZORDER BY (x)", tables={"t": t})
    assert _files_containing(path, "x", 123) <= 2
    assert DeltaTableReader(path).to_df(spark).count() == n


def test_zorder_validation_and_string_dates(spark, tmp_path):
    import datetime

    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(i, f"user{i % 97:03d}", datetime.date(2024, 1, 1)
          + datetime.timedelta(days=i % 365))
         for i in range(512)],
        "k long, name string, d date",
    ).repartition(4))
    w.optimize(spark, target_files=8, zorder_by=["name", "d"])
    got = DeltaTableReader(path).to_df(spark)
    assert got.count() == 512
    # string + date z-keys cluster: a point probe on the string
    # column prunes files (before clustering every file matched)
    assert _files_containing(path, "name", "user050") <= 6
    with pytest.raises(ValueError, match="ZORDER"):
        w.optimize(spark, zorder_by=["nope"])


def test_iceberg_compact_zorder(spark, tmp_path):
    """Iceberg rewrite_data_files z-order strategy: compact(zorder_by)
    keeps manifest-level bounds tight on both clustered columns."""
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergTableReader,
        IcebergTableWriter,
    )

    path = str(tmp_path / "i")
    n = 2048
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % n).alias("x"),
            ((F.col("id") * 40503) % n).alias("y"),
        )
        .repartition(16)
    )
    w = IcebergTableWriter(path)
    w.create(df)
    w.compact(spark, zorder_by=["x", "y"])
    r = IcebergTableReader(path)
    snap = r.snapshot()
    assert len(snap.files) == 16
    got = r.to_df(spark)
    assert got.count() == n

    def hits(col, v):
        c = 0
        for p, _ in snap.files:
            st = (snap.col_stats or {}).get(p, {}).get(col)
            if st and st["min"] <= v <= st["max"]:
                c += 1
        return c

    assert hits("x", 123) <= 8 and hits("y", 456) <= 8
