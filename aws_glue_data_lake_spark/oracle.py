"""Local mirror of the driver's DuckDB oracle-differential check.

The driver runs each ``queries()[name]`` in Spark and ``oracle_sql()[name]``
in DuckDB over the same parquet, then compares row-count + schema +
order-insensitive value-hash. This module reproduces that comparison so
``pytest`` catches divergence before the round gate does.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from aws_glue_data_lake_spark.tables import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Fresh in-memory DuckDB with the fixture tables bound as views —
    the same registration the driver performs."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb_connection(sf_dir)
    try:
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _canonicalize(pdf: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, normalize temporal/decimal dtypes, sort rows —
    the order-insensitive shape the driver hashes."""
    pdf = pdf[sorted(pdf.columns)].copy()
    for col in pdf.columns:
        s = pdf[col]
        if pd.api.types.is_datetime64_any_dtype(s):
            pdf[col] = s.astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, bytes):
            pass  # binary columns compare byte-wise as-is
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), na_position="last").reset_index(
            drop=True
        )
    return pdf


def compare_result(spark_df: DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatches (empty = parity)."""
    problems: list[str] = []
    left = _canonicalize(spark_df.toPandas())
    right = _canonicalize(oracle_pdf)

    if sorted(left.columns) != sorted(right.columns):
        return [f"column mismatch: spark={sorted(left.columns)} oracle={sorted(right.columns)}"]
    if len(left) != len(right):
        problems.append(f"row count: spark={len(left)} oracle={len(right)}")
        return problems

    for col in left.columns:
        ls, rs = left[col], right[col]
        if pd.api.types.is_float_dtype(ls) or pd.api.types.is_float_dtype(rs):
            la = ls.astype("float64").to_numpy()
            ra = rs.astype("float64").to_numpy()
            both_nan = np.isnan(la) & np.isnan(ra)
            eq = (la == ra) | both_nan
        else:
            eq = (ls.to_numpy() == rs.to_numpy()) | (ls.isna() & rs.isna()).to_numpy()
        if not bool(np.all(eq)):
            bad = int(np.argmin(eq))
            problems.append(
                f"column {col!r}: {int((~eq).sum())} mismatched rows; first at row {bad}: "
                f"spark={ls.iloc[bad]!r} oracle={rs.iloc[bad]!r}"
            )
    return problems
