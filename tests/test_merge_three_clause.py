"""Three-clause MERGE (VERDICT r12 item 2): ``WHEN NOT MATCHED BY
SOURCE THEN UPDATE/DELETE`` — delta-spark's standard SCD / full-sync
generalization of the reference's whenMatchedDelete
(delta/delta_tables.py:159-160) — on the Delta, Iceberg and lake
writers plus the SQL front door."""

import pytest

from aws_glue_data_lake_spark.deltacompat import (
    DeltaTableReader,
    DeltaTableWriter,
)


def _rows(spark, path):
    return sorted(
        (r["k"], r["v"], r["active"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )


def _mk(spark, tmp_path):
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", True), (2, "b", True), (3, "c", True)],
        "k long, v string, active boolean",
    ).coalesce(1))
    # second file so carry-by-reference is observable
    w.append(spark.createDataFrame(
        [(10, "x", True)], "k long, v string, active boolean"
    ))
    return path, w


def test_delta_nmbs_delete(spark, tmp_path):
    """Unconditioned NMBS DELETE: target rows with no source key go;
    matched rows replace; new keys insert (the full-sync shape)."""
    path, w = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(2, "B", True), (4, "d", True)],
        "k long, v string, active boolean",
    )
    w.merge(spark, src, keys=["k"], not_matched_by_source="delete")
    assert _rows(spark, path) == [(2, "B", True), (4, "d", True)]


def test_delta_nmbs_conditional_update(spark, tmp_path):
    """NMBS UPDATE SET with a condition: only unmatched rows satisfying
    it change; other unmatched rows carry verbatim — including whole
    files with no eligible row (carried by reference, no rewrite)."""
    import os

    path, w = _mk(spark, tmp_path)
    before = {p for p, _, _ in DeltaTableReader(path).snapshot().files}
    src = spark.createDataFrame(
        [(1, "A", True)], "k long, v string, active boolean"
    )
    w.merge(
        spark, src, keys=["k"],
        not_matched_by_source="update",
        not_matched_by_source_condition="k < 5",
        not_matched_by_source_set={"active": "false"},
    )
    assert _rows(spark, path) == [
        (1, "A", True), (2, "b", False), (3, "c", False),
        (10, "x", True),
    ]
    after = {p for p, _, _ in DeltaTableReader(path).snapshot().files}
    # k=10's file holds no row matching k<5: carried by reference
    assert len(before & after) == 1


def test_delta_nmbs_empty_source_deletes_all_eligible(spark, tmp_path):
    """MERGE with an EMPTY source and NMBS DELETE: every target row is
    unmatched — conditioned delete applies to the whole table."""
    path, w = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [], "k long, v string, active boolean"
    )
    w.merge(
        spark, src, keys=["k"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="k >= 3",
    )
    assert _rows(spark, path) == [(1, "a", True), (2, "b", True)]


def test_delta_nmbs_validation(spark, tmp_path):
    path, w = _mk(spark, tmp_path)
    src = spark.createDataFrame(
        [(1, "A", True)], "k long, v string, active boolean"
    )
    with pytest.raises(ValueError, match="must be None"):
        w.merge(spark, src, keys=["k"], not_matched_by_source="nuke")
    with pytest.raises(ValueError, match="requires"):
        w.merge(spark, src, keys=["k"], not_matched_by_source="update")
    with pytest.raises(ValueError, match="unknown"):
        w.merge(
            spark, src, keys=["k"],
            not_matched_by_source="update",
            not_matched_by_source_set={"nope": "1"},
        )


def test_delta_nmbs_cdf_records_third_clause_rows(spark, tmp_path):
    """Under CDF the NMBS rows land in the cdc file as delete /
    update_preimage+postimage — the true row-level delta."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(
        spark.createDataFrame(
            [(1, "a", True), (2, "b", True)],
            "k long, v string, active boolean",
        ),
    )
    w.set_property("delta.enableChangeDataFeed", "true")  # v1
    src = spark.createDataFrame(
        [(1, "A", True)], "k long, v string, active boolean"
    )
    w.merge(
        spark, src, keys=["k"],
        not_matched_by_source="update",
        not_matched_by_source_set={"active": "false"},
    )
    ch = sorted(
        (r["k"], r["_change_type"])
        for r in DeltaTableReader(path)
        .changes(spark, starting_version=2)
        .collect()
    )
    assert ch == [
        (1, "update_postimage"), (1, "update_preimage"),
        (2, "update_postimage"), (2, "update_preimage"),
    ]


def test_iceberg_nmbs_delete_and_update(spark, tmp_path):
    """Iceberg three-clause merge stays MERGE-ON-READ: eligible
    unmatched rows are equality-deleted (and, for update, reinserted
    transformed) — no data-file rewrite of carried rows."""
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergTableReader,
        IcebergTableWriter,
    )

    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", True), (2, "b", True), (3, "c", True)],
        "k long, v string, active boolean",
    ))
    src = spark.createDataFrame(
        [(2, "B", True), (4, "d", True)],
        "k long, v string, active boolean",
    )
    w.merge(
        src, keys=["k"],
        not_matched_by_source="update",
        not_matched_by_source_condition="k = 3",
        not_matched_by_source_set={"active": "false"},
    )
    got = sorted(
        (r["k"], r["v"], r["active"])
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [
        (1, "a", True), (2, "B", True), (3, "c", False),
        (4, "d", True),
    ]
    w.merge(
        spark.createDataFrame([], "k long, v string, active boolean"),
        keys=["k"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="NOT active",
    )
    got = sorted(
        (r["k"], r["v"], r["active"])
        for r in IcebergTableReader(path).to_df(spark).collect()
    )
    assert got == [(1, "a", True), (2, "B", True), (4, "d", True)]


def test_lake_nmbs_delete_moves_only_eligible_files(spark, tmp_path):
    """Lake three-clause: files with no eligible unmatched row stay
    carried by reference; eligible ones are rewritten."""
    from aws_glue_data_lake_spark.lake import LakeTable

    path = str(tmp_path / "l")
    t = LakeTable(path)
    t.create(
        spark.createDataFrame(
            [(1, "a", True), (2, "b", True)],
            "k long, v string, active boolean",
        ).coalesce(1),
        stat_cols=["k"],
    )
    t.append(spark.createDataFrame(
        [(10, "x", True)], "k long, v string, active boolean"
    ))
    before = set(t.snapshot().file_names)
    src = spark.createDataFrame(
        [(1, "A", True)], "k long, v string, active boolean"
    )
    t.upsert(
        src, keys=["k"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="k < 5",
    )
    got = sorted(
        (r["k"], r["v"])
        for r in t.read(spark).collect()
    )
    assert got == [(1, "A"), (10, "x")]
    after = set(t.snapshot().file_names)
    # k=10's file holds no row with k<5: carried verbatim
    assert len(before & after) == 1


def test_sql_front_door_three_clause(spark, tmp_path):
    """The delta-spark SQL text: WHEN MATCHED UPDATE SET * / NOT
    MATCHED INSERT * / NOT MATCHED BY SOURCE AND <pred> THEN UPDATE SET
    — parsed and routed through the facade."""
    from aws_glue_data_lake_spark.sqlfront import sql
    from aws_glue_data_lake_spark.table import open_table

    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", True), (2, "b", True)],
        "k long, v string, active boolean",
    ))
    spark.createDataFrame(
        [(1, "A", True)], "k long, v string, active boolean"
    ).createOrReplaceTempView("batch")
    t = open_table(path, "delta")
    sql(
        spark,
        "MERGE INTO t AS tgt USING batch AS s ON tgt.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND tgt.k < 5 "
        "THEN UPDATE SET active = false, v = upper(tgt.v)",
        tables={"t": t},
    )
    assert _rows(spark, path) == [(1, "A", True), (2, "B", False)]
    sql(
        spark,
        "MERGE INTO t AS tgt USING batch AS s ON tgt.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE",
        tables={"t": t},
    )
    assert _rows(spark, path) == [(1, "A", True)]


def test_iceberg_nmbs_set_without_update_raises(spark, tmp_path):
    """ADVICE r13: the Iceberg writer mirrors Delta's third validation
    — not_matched_by_source_set without not_matched_by_source='update'
    is an error, never silently ignored."""
    from aws_glue_data_lake_spark.icebergcompat import IcebergTableWriter

    path = str(tmp_path / "i")
    w = IcebergTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", True)], "k long, v string, active boolean"
    ))
    src = spark.createDataFrame(
        [(1, "A", True)], "k long, v string, active boolean"
    )
    with pytest.raises(ValueError, match="only applies"):
        w.merge(
            src, keys=["k"],
            not_matched_by_source="delete",
            not_matched_by_source_set={"active": "false"},
        )
    with pytest.raises(ValueError, match="only applies"):
        w.merge(
            src, keys=["k"],
            not_matched_by_source_set={"active": "false"},
        )


def test_delta_nmbs_probe_ignores_dv_deleted_rows(spark, tmp_path):
    """ADVICE r13: a DV-deleted row must not mark its file
    NMBS-eligible. file2's only clause-satisfying row is dead under a
    deletion vector, so the merge must carry file2 by reference (same
    path in the next snapshot), not rewrite it."""
    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", True)], "k long, v string, active boolean"
    ).coalesce(1))
    w.append(spark.createDataFrame(
        [(9, "z", False)], "k long, v string, active boolean"
    ).coalesce(1))
    w.delete_where(spark, "k = 9")  # DV tombstone — file kept
    snap0 = DeltaTableReader(path).snapshot()
    (dv_file,) = [p for p, _pv, dv in snap0.files if dv]
    src = spark.createDataFrame(
        [(1, "A", True)], "k long, v string, active boolean"
    )
    w.merge(
        spark, src, keys=["k"],
        not_matched_by_source="delete",
        not_matched_by_source_condition="active = false",
    )
    snap1 = DeltaTableReader(path).snapshot()
    assert dv_file in {p for p, _pv, _dv in snap1.files}, (
        "DV-dead row forced a needless rewrite of its file"
    )
    assert _rows(spark, path) == [(1, "A", True)]
