"""Name-based catalog binding for format tables (VERDICT r9 item 2).

The reference resolves every table by CATALOG NAME: the Iceberg job reads
``spark.table(f'{CATALOG}.{DATABASE}.{TABLE}')`` (reference
icberg/iceberg_tables.py:65-66) and the Delta job registers its
destination in the Glue/Athena catalog with
``CREATE EXTERNAL TABLE IF NOT EXISTS {table} LOCATION '{path}'
TBLPROPERTIES ('table_type'='DELTA')`` (reference
delta/delta_tables.py:41-47, executed via Athena at :59-72). This module
is that registration layer for the jar-free engine: a ``db.tbl`` name is
BOUND to a (path, format) pair as a catalog table entry carrying the same
``table_type`` property Athena uses, and resolution hands back the
:class:`~aws_glue_data_lake_spark.table.Table` facade.

The entry is a real Spark catalog table (``USING parquet LOCATION ...``
with the table's current schema), so it lives wherever the session's
catalog lives: under :func:`~aws_glue_data_lake_spark.session.
get_catalog_spark`'s Derby-backed Hive metastore the binding is durable
and SHARED ACROSS PROCESSES — two jobs pointed at the same catalog dir
resolve the same names, the two-Glue-jobs-one-table deployment. Under a
vanilla in-memory catalog it is session-scoped (Glue-catalog-less spark
behaves the same way).

Direct ``spark.table('db.tbl')`` against a binding is the same
best-effort raw-parquet view any non-Delta-aware engine gets from an
Athena-registered Delta table (it ignores the transaction log — on a
table with removed files or DVs it returns SUPERSET rows). The supported
read/write route is :func:`resolve_table` / ``open_table('db.tbl')`` /
``sqlfront.sql``, which interpret ``table_type`` exactly like Athena's
Delta/Iceberg support does.

Scale: binding and resolution are pure catalog metadata (one DDL / two
catalog lookups); no data I/O ever happens here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from aws_glue_data_lake_spark.table import FORMATS, Table, open_table

__all__ = ["bind_table", "binding", "resolve_table", "unbind_table"]

#: the Athena/Glue property that marks a lake-format table — accepted in
#: DDL text (sqlfront), but STORED under a namespaced key because Spark 4
#: reserves bare ``table_type`` in TBLPROPERTIES
#: (UNSUPPORTED_FEATURE.SET_TABLE_PROPERTY)
TABLE_TYPE_KEY = "lakehouse.table_type"


def _q(name: str) -> str:
    """Quote a (possibly db-qualified) table name for DDL."""
    return ".".join(f"`{part.strip('`')}`" for part in name.split("."))


def bind_table(
    spark: SparkSession,
    name: str,
    path: str,
    format: str | None = None,  # noqa: A002
    replace: bool = False,
) -> Table:
    """Register ``name`` (``tbl`` or ``db.tbl``) -> the format table at
    ``path``. The layout must already exist (this binds, it does not
    create); ``format=None`` auto-detects. Returns the facade handle.

    With ``replace=False`` an existing same-name entry fails loudly
    (the reference's DDL carries IF NOT EXISTS — pass the statement
    through :func:`aws_glue_data_lake_spark.sqlfront.sql` to get that
    exact semantics)."""
    t = open_table(os.path.abspath(path), format)
    parts = name.split(".")
    if len(parts) not in (1, 2):
        raise ValueError(
            f"bind_table name {name!r} must be 'tbl' or 'db.tbl'"
        )
    if len(parts) == 2:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS `{parts[0].strip('`')}`")
    if spark.catalog.tableExists(name):
        if not replace:
            raise FileExistsError(
                f"catalog already has a table named {name!r}; pass "
                "replace=True to rebind"
            )
        spark.sql(f"DROP TABLE {_q(name)}")
    schema = t.read(spark).schema  # lazy plan: schema only, no job
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    spark.sql(
        f"CREATE TABLE {_q(name)} ({cols}) USING parquet "
        f"LOCATION '{t.path}' "
        f"TBLPROPERTIES ('{TABLE_TYPE_KEY}'='{t.format.upper()}')"
    )
    return t


def binding(spark: SparkSession, name: str) -> tuple[str, str] | None:
    """(path, format) for a bound name, or None when ``name`` is not a
    catalog entry carrying a ``table_type`` we own (plain parquet
    saveAsTable tables, views and temp views all return None — they
    resolve through Spark SQL as themselves)."""
    try:
        if not spark.catalog.tableExists(name):
            return None
    except Exception:
        return None  # malformed identifier: not ours
    try:
        props = {
            r["key"]: r["value"]
            for r in spark.sql(
                f"SHOW TBLPROPERTIES {_q(name)}"
            ).collect()
        }
    except Exception:
        return None  # temp view etc.: no TBLPROPERTIES surface
    fmt = props.get(TABLE_TYPE_KEY, "").lower()
    if fmt not in FORMATS:
        return None
    for row in spark.sql(f"DESCRIBE TABLE EXTENDED {_q(name)}").collect():
        if row["col_name"].strip().lower() == "location":
            loc = row["data_type"].strip()
            if loc.startswith("file:"):
                import urllib.parse

                loc = urllib.parse.urlparse(loc).path
            return loc, fmt
    return None


def resolve_table(spark: SparkSession, name: str) -> Table:
    """Open a bound name as the facade — the engine's
    ``spark.table(f'{CATALOG}.{DATABASE}.{TABLE}')`` (reference
    icberg/iceberg_tables.py:65-66)."""
    b = binding(spark, name)
    if b is None:
        raise FileNotFoundError(
            f"no format-table binding named {name!r} in the session "
            "catalog (bind_table(), or the CREATE EXTERNAL TABLE DDL "
            "through sqlfront.sql, creates one)"
        )
    return open_table(*b)


def unbind_table(spark: SparkSession, name: str) -> None:
    """Drop the binding; the table's data/log are untouched (external
    semantics, like dropping an Athena-registered table)."""
    if binding(spark, name) is None:
        raise FileNotFoundError(f"no format-table binding named {name!r}")
    spark.sql(f"DROP TABLE {_q(name)}")
