"""SQL front door: the reference's literal MERGE template text
(icberg/iceberg_tables.py:45-50) and time-travel SELECTs, executed
against open_table facades on all three layouts."""

import pytest
from pyspark.sql import functions as F

from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table

# the reference's template, verbatim (icberg/iceberg_tables.py:45-50)
MERGE_SQL_STMNT = """
    MERGE INTO {CATALOG}.{DATABASE}.{TABLE} AS data
    USING input_data_updates AS updates
    ON data.{primary_key} = updates.{primary_key}
    WHEN MATCHED THEN DELETE
    """


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, v long")


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_reference_merge_template_runs(spark, tmp_path, fmt):
    """The reference's exact MERGE ... WHEN MATCHED THEN DELETE text:
    matching keys are deleted; the caller then appends the deduped
    batch — the reference's incremental-load shape."""
    path = str(tmp_path / fmt)
    t = open_table(path, fmt).create(
        _mk(spark, [(1, 10), (2, 20), (3, 30)])
    )
    updates = _mk(spark, [(2, 99), (4, 40)])
    updates.createOrReplaceTempView("input_data_updates")
    out = sql(
        spark,
        MERGE_SQL_STMNT.format(
            CATALOG="glue_catalog", DATABASE="db", TABLE="tbl",
            primary_key="k",
        ),
        tables={"glue_catalog.db.tbl": path},
    )
    assert out is None
    assert sorted((r["k"], r["v"]) for r in t.read(spark).collect()) == [
        (1, 10), (3, 30)
    ]
    # the reference then appends the deduped batch
    t.append(updates)
    assert sorted((r["k"], r["v"]) for r in t.read(spark).collect()) == [
        (1, 10), (2, 99), (3, 30), (4, 40)
    ]


def test_merge_update_insert_star(spark, tmp_path):
    path = str(tmp_path / "d")
    t = open_table(path, "delta").create(_mk(spark, [(1, 10), (2, 20)]))
    _mk(spark, [(2, 99), (3, 30)]).createOrReplaceTempView("upd")
    sql(
        spark,
        f"MERGE INTO delta.`{path}` AS t USING upd AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    assert sorted((r["k"], r["v"]) for r in t.read(spark).collect()) == [
        (1, 10), (2, 99), (3, 30)
    ]


def test_select_with_version_as_of(spark, tmp_path):
    path = str(tmp_path / "d")
    t = open_table(path, "delta").create(_mk(spark, [(1, 10)]))
    t.append(_mk(spark, [(2, 20)]))
    cur = sql(
        spark,
        f"SELECT k, v FROM delta.`{path}` ORDER BY k",
    ).collect()
    assert [(r["k"], r["v"]) for r in cur] == [(1, 10), (2, 20)]
    old = sql(
        spark,
        f"SELECT count(*) AS n FROM delta.`{path}` VERSION AS OF 0",
    ).collect()
    assert old[0]["n"] == 1
    # tables-mapping name resolution inside a bigger statement
    got = sql(
        spark,
        "SELECT t.k + 1 AS k1 FROM mytbl t WHERE t.k = 2",
        tables={"mytbl": path},
    ).collect()
    assert [r["k1"] for r in got] == [3]


def test_unsupported_shapes_fail_loudly(spark, tmp_path):
    path = str(tmp_path / "d")
    open_table(path, "delta").create(_mk(spark, [(1, 10)]))
    _mk(spark, [(1, 11)]).createOrReplaceTempView("u2")
    with pytest.raises(ValueError, match="clause shape"):
        sql(
            spark,
            f"MERGE INTO delta.`{path}` AS t USING u2 AS s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET v = s.v",
        )
    with pytest.raises(ValueError, match="condition clause"):
        sql(
            spark,
            f"MERGE INTO delta.`{path}` AS t USING u2 AS s ON t.k > s.k "
            "WHEN MATCHED THEN DELETE",
        )
    with pytest.raises(ValueError, match="not a known table"):
        sql(
            spark,
            "MERGE INTO nowhere AS t USING u2 AS s ON t.k = s.k "
            "WHEN MATCHED THEN DELETE",
        )


def test_merge_cdc_shape_with_delete_predicate(spark, tmp_path):
    """The full CDC MERGE (delta-spark's common template): a
    source-side predicate routes rows to DELETE, the rest upsert."""
    path = str(tmp_path / "d")
    t = open_table(path, "delta").create(
        spark.createDataFrame(
            [(1, 10), (2, 20), (3, 30)], "k long, v long"
        )
    )
    spark.createDataFrame(
        [(2, 99, "U"), (3, 0, "D"), (4, 40, "I")],
        "k long, v long, Op string",
    ).createOrReplaceTempView("cdc_batch")
    sql(
        spark,
        f"MERGE INTO delta.`{path}` AS t USING cdc_batch AS s "
        "ON t.k = s.k "
        "WHEN MATCHED AND s.Op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
    )
    got = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    assert got == [(1, 10), (2, 99), (4, 40)]


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_update_statement_single_commit(spark, tmp_path, fmt):
    """UPDATE ... SET ... WHERE through the front door: one commit,
    assignments applied to matching rows only, multi-assignment SET
    list with expressions referencing other columns."""
    path = str(tmp_path / fmt)
    t = open_table(path, fmt).create(
        _mk(spark, [(k, k * 10) for k in range(1, 8)])
    )
    before = len(t.history())
    out = sql(
        spark,
        f"UPDATE {fmt}.`{path}` SET v = v + 1000 WHERE k % 2 = 0",
    )
    assert out is None
    rows = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert rows == {
        k: k * 10 + (1000 if k % 2 == 0 else 0) for k in range(1, 8)
    }
    assert len(t.history()) == before + 1  # ONE commit


def test_update_without_where_touches_all(spark, tmp_path):
    path = str(tmp_path / "t")
    t = open_table(path, "delta").create(_mk(spark, [(1, 1), (2, 2)]))
    sql(spark, f"UPDATE delta.`{path}` SET v = k * 100")
    assert sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    ) == [(1, 100), (2, 200)]


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_delete_statement(spark, tmp_path, fmt):
    path = str(tmp_path / fmt)
    t = open_table(path, fmt).create(
        _mk(spark, [(k, k) for k in range(10)])
    )
    assert sql(spark, f"DELETE FROM {fmt}.`{path}` WHERE k >= 5") is None
    assert sorted(r["k"] for r in t.read(spark).collect()) == [
        0, 1, 2, 3, 4,
    ]


def test_update_unknown_column_fails_loudly(spark, tmp_path):
    path = str(tmp_path / "t")
    open_table(path, "delta").create(_mk(spark, [(1, 1)]))
    with pytest.raises(ValueError, match="unknown column"):
        sql(spark, f"UPDATE delta.`{path}` SET nope = 1")


def test_update_only_rewrites_matched_files(spark, tmp_path):
    """Scale contract: files without a matching row are carried by
    reference — the delta log's new version must REMOVE only the files
    that held matches."""
    from aws_glue_data_lake_spark.deltacompat import DeltaTableReader

    path = str(tmp_path / "t")
    t = open_table(path, "delta")
    # two files via partition dirs: k<5 in p=0, rest in p=1
    df = spark.createDataFrame(
        [(k, k * 10, k // 5) for k in range(10)], "k long, v long, p long"
    )
    t.create(df, partition_by=["p"])
    files_before = {
        f for f, _, _ in DeltaTableReader(path).snapshot().files
    }
    sql(spark, f"UPDATE delta.`{path}` SET v = 0 WHERE k = 7")  # p=1 only
    files_after = {
        f for f, _, _ in DeltaTableReader(path).snapshot().files
    }
    carried = files_before & files_after
    rewritten = files_before - files_after
    assert rewritten, "the matched file must be rewritten"
    # every p=0 file carries by reference; only p=1 file(s) holding k=7
    # are rewritten
    assert {f for f in files_before if "p=0" in f} <= carried
    assert all("p=1" in f for f in rewritten)


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_insert_statement_select_and_values(spark, tmp_path, fmt):
    """INSERT INTO through the front door: a SELECT body (columns by
    name) and a VALUES body (positional), both appending one commit."""
    path = str(tmp_path / fmt)
    t = open_table(path, fmt).create(_mk(spark, [(1, 10), (2, 20)]))
    _mk(spark, [(3, 30), (4, 40)]).createOrReplaceTempView("ins_src")
    sql(spark, f"INSERT INTO {fmt}.`{path}` SELECT k, v FROM ins_src")
    sql(
        spark,
        f"INSERT INTO {fmt}.`{path}` VALUES "
        "(CAST(5 AS LONG), CAST(50 AS LONG))",
    )
    assert sorted(
        (r["k"], r["v"]) for r in t.read(spark).collect()
    ) == [(1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]


def test_insert_missing_column_fails_loudly(spark, tmp_path):
    path = str(tmp_path / "t")
    open_table(path, "delta").create(_mk(spark, [(1, 10)]))
    spark.createDataFrame([(9,)], "k long").createOrReplaceTempView(
        "ins_bad"
    )
    with pytest.raises(ValueError, match="lacks target column"):
        sql(spark, f"INSERT INTO delta.`{path}` SELECT k FROM ins_bad")
