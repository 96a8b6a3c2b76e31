"""Persistent shared catalog (VERDICT r6 item 4): two SEPARATE engine
processes pointed at the same catalog dir must share table names the way
two Glue jobs share ``hamzatest.*`` through the Glue Data Catalog
(reference icberg/iceberg_tables.py:54-58). Subprocesses, not two
sessions in one JVM — catalog implementation is fixed at JVM session
creation, so same-process "session B" would silently reuse A's."""

import subprocess
import sys
import textwrap

SF = "/root/testdata/sf0.001"


def _run(code: str) -> str:
    r = subprocess.run(
        [sys.executable, "-c", textwrap.dedent(code)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def test_saveAsTable_visible_to_fresh_process(tmp_path):
    cat = str(tmp_path / "cat")
    out_a = _run(
        f"""
        import sys; sys.path.insert(0, "/root/repo")
        from aws_glue_data_lake_spark.session import get_catalog_spark
        from aws_glue_data_lake_spark.tables import (
            create_table_v2, load_table, register_external_table,
        )
        s = get_catalog_spark({cat!r}, cpus=4, shuffle_partitions=4)
        n = load_table(s, {SF!r}, "nation")
        # managed CTAS through the v2 writer (reference writeTo().create())
        create_table_v2(n, "shared_nation")
        # external table pinned at the fixture location (reference's
        # CREATE EXTERNAL TABLE ... LOCATION DDL)
        register_external_table(
            s, "shared_nation_ext", {SF!r} + "/nation.parquet"
        )
        print("A:", s.catalog.tableExists("shared_nation"),
              s.catalog.tableExists("shared_nation_ext"))
        s.stop()
        """
    )
    assert "A: True True" in out_a
    out_b = _run(
        f"""
        import sys; sys.path.insert(0, "/root/repo")
        from aws_glue_data_lake_spark.session import get_catalog_spark
        s = get_catalog_spark({cat!r}, cpus=4, shuffle_partitions=4)
        managed = s.table("shared_nation").count()
        ext = s.table("shared_nation_ext").count()
        print("B:", managed, ext, managed == ext)
        # B can append through the shared name; a third reader would see 2x
        s.table("shared_nation").limit(5).write.mode("append").saveAsTable(
            "shared_nation"
        )
        print("B2:", s.table("shared_nation").count() == managed + 5)
        s.stop()
        """
    )
    assert "True" in out_b.split("B:")[1].splitlines()[0]
    assert "B2: True" in out_b


def test_catalog_guard_rejects_in_memory_session(spark, tmp_path):
    """Inside a process that already holds an in-memory-catalog session,
    get_catalog_spark must refuse instead of silently returning a session
    whose names are NOT shared."""
    import pytest

    from aws_glue_data_lake_spark.session import get_catalog_spark

    with pytest.raises(RuntimeError, match="FIRST session"):
        get_catalog_spark(str(tmp_path / "cat"))
