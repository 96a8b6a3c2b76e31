"""Delta liquid clustering (round 14): CREATE TABLE ... CLUSTER BY /
ALTER TABLE ... CLUSTER BY (cols) | NONE (protocol § Clustered Table
— Databricks' default layout for new tables). The declaration is
metadata (the ``delta.clustering`` domain, physical-name paths);
OPTIMIZE with no ZORDER args reads it and clusters the rewrite by the
declared columns, and an explicit ZORDER BY is refused on a clustered
table the way delta-spark refuses it."""

import json

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaTableReader,
    DeltaTableWriter,
    _clustering_logical_cols,
    _clustering_paths,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _scrambled(spark, n=4096, parts=8):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            ((F.col("id") * 2654435761) % n).alias("x"),
            ((F.col("id") * 40503) % n).alias("y"),
        )
        .repartition(parts)
    )


def _files_containing(path, col, v):
    snap = DeltaTableReader(path).snapshot()
    c = 0
    for p, _, _ in snap.files:
        st = (snap.stats or {}).get(p) or {}
        lo = (st.get("minValues") or {}).get(col)
        hi = (st.get("maxValues") or {}).get(col)
        if lo is not None and lo <= v <= hi:
            c += 1
    return c


def test_create_clustered_then_optimize_clusters(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    n = 4096
    w.create(_scrambled(spark, n), cluster_by=["x", "y"])
    snap = DeltaTableReader(path).snapshot()
    # protocol: writer v7 with the two features delta-spark stamps
    proto = snap.raw_protocol
    assert proto["minWriterVersion"] == 7
    assert {"clusteredTable", "domainMetadata"} <= set(
        proto["writerFeatures"]
    )
    # the domain carries physical-name paths (here physical==logical)
    dom = snap.domains["delta.clustering"]
    assert json.loads(dom["configuration"])["clusteringColumns"] == [
        ["x"], ["y"],
    ]
    assert _clustering_logical_cols(snap) == ["x", "y"]
    # OPTIMIZE with no zorder args clusters by the DECLARED columns
    assert _files_containing(path, "x", 123) >= 7
    w.optimize(spark, target_files=16)
    assert _files_containing(path, "x", 123) <= 8
    assert _files_containing(path, "y", 456) <= 8
    got = DeltaTableReader(path).to_df(spark)
    assert got.count() == n
    # explicit ZORDER BY on a clustered table: refused (delta-spark)
    with pytest.raises(ValueError, match="clustered table"):
        w.optimize(spark, zorder_by=["x"])
    # the clustering domain survives the OPTIMIZE commit
    assert _clustering_logical_cols(
        DeltaTableReader(path).snapshot()
    ) == ["x", "y"]


def test_alter_cluster_by_and_none(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(_scrambled(spark, 1024, 4))  # unclustered create
    snap = DeltaTableReader(path).snapshot()
    assert _clustering_logical_cols(snap) == []
    w.set_cluster_by(["x"])
    snap = DeltaTableReader(path).snapshot()
    assert _clustering_logical_cols(snap) == ["x"]
    assert snap.raw_protocol["minWriterVersion"] == 7
    # legacy (1,2)-implied features re-declared on the upgrade
    assert {"appendOnly", "invariants", "clusteredTable"} <= set(
        snap.raw_protocol["writerFeatures"]
    )
    w.optimize(spark, target_files=4)
    assert _files_containing(path, "x", 123) <= 2
    # CLUSTER BY NONE: domain stays, column list empties; OPTIMIZE
    # goes back to plain compaction (no refusal, no clustering)
    w.set_cluster_by([])
    snap = DeltaTableReader(path).snapshot()
    assert _clustering_logical_cols(snap) == []
    assert "delta.clustering" in snap.domains
    w.optimize(spark, target_files=1, zorder_by=["y"])  # allowed again
    assert DeltaTableReader(path).to_df(spark).count() == 1024


def test_cluster_by_validation(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    df = spark.createDataFrame(
        [(1, "a", [1, 2], 1.5)],
        "k long, p string, arr array<int>, v double",
    )
    with pytest.raises(ValueError, match="at most 4"):
        w.create(df, cluster_by=["k", "p", "v", "k", "p"])
    with pytest.raises(ValueError, match="duplicate"):
        w.create(df, cluster_by=["k", "k"])
    with pytest.raises(ValueError, match="not in table schema"):
        w.create(df, cluster_by=["nope"])
    with pytest.raises(ValueError, match="partition column"):
        w.create(df, partition_by=["p"], cluster_by=["p"])
    with pytest.raises(ValueError, match="stats-eligible"):
        w.create(df, cluster_by=["arr"])
    with pytest.raises(ValueError, match="top-level"):
        w.create(df, cluster_by=["s.inner"])
    # nothing committed by the failed creates
    w.create(df, cluster_by=["k"])
    assert DeltaTableReader(path).snapshot().version == 0


def test_physical_paths_under_column_mapping():
    """The domain stores PHYSICAL names (protocol requirement: the
    declaration survives RENAME COLUMN under columnMapping); the
    logical mapping resolves back for OPTIMIZE."""
    st = StructType.fromJson(
        {
            "type": "struct",
            "fields": [
                {
                    "name": "x",
                    "type": "long",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 1,
                        "delta.columnMapping.physicalName": "col-aaa",
                    },
                },
                {
                    "name": "y",
                    "type": "string",
                    "nullable": True,
                    "metadata": {
                        "delta.columnMapping.id": 2,
                        "delta.columnMapping.physicalName": "col-bbb",
                    },
                },
            ],
        }
    )
    assert _clustering_paths(st, ["x", "y"], ()) == [
        ["col-aaa"], ["col-bbb"],
    ]

    class Snap:
        domains = {
            "delta.clustering": {
                "configuration": json.dumps(
                    {"clusteringColumns": [["col-bbb"]]}
                )
            }
        }
        schema = st

    # y renamed to z logically: physical col-bbb still resolves
    st.fields[1].name = "z"
    assert _clustering_logical_cols(Snap()) == ["z"]


def test_sql_front_door(spark, tmp_path):
    """CREATE TABLE ... USING delta CLUSTER BY (...) AS SELECT,
    ALTER TABLE ... CLUSTER BY, OPTIMIZE, DESCRIBE DETAIL."""
    path = str(tmp_path / "t")
    _scrambled(spark, 2048, 8).createOrReplaceTempView("lc_src")
    sql(
        spark,
        f"CREATE TABLE lcdb.t USING delta CLUSTER BY (x, y) "
        f"LOCATION '{path}' AS SELECT * FROM lc_src",
    )
    t = open_table(path, "delta")
    det = sql(spark, "DESCRIBE DETAIL t", tables={"t": t}).first()
    assert det["clustering_columns"] == ["x", "y"]
    assert det["partition_columns"] == []
    sql(spark, "OPTIMIZE t", tables={"t": t})
    assert _files_containing(path, "x", 123) <= 8
    assert _files_containing(path, "y", 456) <= 8
    with pytest.raises(ValueError, match="clustered table"):
        sql(spark, "OPTIMIZE t ZORDER BY (x)", tables={"t": t})
    # re-declare then drop via ALTER
    sql(spark, "ALTER TABLE t CLUSTER BY (k)", tables={"t": t})
    assert sql(
        spark, "DESCRIBE DETAIL t", tables={"t": t}
    ).first()["clustering_columns"] == ["k"]
    sql(spark, "ALTER TABLE t CLUSTER BY NONE", tables={"t": t})
    assert sql(
        spark, "DESCRIBE DETAIL t", tables={"t": t}
    ).first()["clustering_columns"] == []
    sql(spark, "OPTIMIZE t ZORDER BY (x)", tables={"t": t})
    assert (
        sql(spark, "SELECT count(*) AS n FROM t", tables={"t": t})
        .first()["n"]
        == 2048
    )


def test_cluster_by_refused_on_other_formats(spark, tmp_path):
    df = spark.createDataFrame([(1, 2)], "k long, x long")
    for fmt in ("iceberg", "lake"):
        with pytest.raises(ValueError, match="Delta feature"):
            open_table(
                str(tmp_path / fmt), fmt
            ).create(df, cluster_by=["x"])
    t = open_table(str(tmp_path / "l2"), "lake").create(df)
    with pytest.raises(NotImplementedError, match="Delta protocol"):
        t.set_cluster_by(["x"])
