"""Fixture-drift canary (VERDICT r4 item 3).

Round 4 post-mortem: the driver regenerated ``events.parquet`` with a
different physical type for ``ts`` (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)/
NTZ) and the engine's hard-coded normalization broke 14 oracle rows, the
smoke check, and the bench — silently, spread across eight modules. This
test makes the next drift fail as ONE named assertion:

- every time-like fixture column must resolve through ``tables.ts_us_col``
  (the engine-wide dtype dispatcher) on every sf dir — a new physical type
  the dispatcher can't handle raises here first;
- the normalized epoch-µs min/max must BIT-MATCH DuckDB's ``EPOCH_US`` on
  the same files — the exact parity contract every oracle comparison
  assumes, checked end-to-end per dtype branch.
"""

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from aws_glue_data_lake_spark.tables import load_table, ts_us_col

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

#: (table, column) pairs the queries treat as event time.
TIME_COLS = [("events", "ts"), ("orders", "o_orderdate"), ("lineitem", "l_shipdate")]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table,col", TIME_COLS)
def test_time_columns_normalize_and_match_duckdb(spark, sf_dir, table, col):
    df = load_table(spark, sf_dir, table)
    us = ts_us_col(df, col)  # raises TypeError on an unhandled physical type
    lo, hi = df.agg(F.min(us), F.max(us)).first()
    path = os.path.join(sf_dir, f"{table}.parquet")
    d_lo, d_hi = duckdb.sql(
        f"SELECT CAST(EPOCH_US(MIN({col})) AS BIGINT),"
        f" CAST(EPOCH_US(MAX({col})) AS BIGINT)"
        f" FROM read_parquet('{path}')"
    ).fetchone()
    assert (lo, hi) == (d_lo, d_hi), (
        f"{table}.{col} normalization diverged from DuckDB EPOCH_US at "
        f"{sf_dir}: spark ({lo}, {hi}) vs duckdb ({d_lo}, {d_hi}) — "
        "fixture physical type drifted past ts_us_col's dispatch"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_in_plausible_epoch_range(spark, sf_dir):
    """Unit-scale guard: a silent ns↔µs (1000×) mix-up lands centuries away
    from any plausible event time; pin the fixture to [2000, 2100)."""
    df = load_table(spark, sf_dir, "events")
    lo, hi = df.agg(F.min(ts_us_col(df)), F.max(ts_us_col(df))).first()
    y2000, y2100 = 946_684_800_000_000, 4_102_444_800_000_000
    assert y2000 <= lo <= hi < y2100
