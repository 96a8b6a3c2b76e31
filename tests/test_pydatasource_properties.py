"""Property-based checks of the Python DataSource connector pieces that
have pure-Python kernels (no Spark session per example, so the budget can
be generous):

- the synthetic CDC feed's Arrow generator must equal its SQL oracle twin
  (FEED_SQL via DuckDB) on ANY id range — this is the contract every
  registered query over the connector leans on;
- partition planning must tile the (possibly filter-narrowed) id range
  exactly: disjoint, ordered, covering;
- the stream reader's offset walk must replay the same rows as one batch
  read, for any slab size (at-least-once redelivery folds to exactly-once
  because offsets never overlap);
- the ListState median kernel's arithmetic (sorted lower+upper middle)
  must equal numpy's median doubled, for any multiset of values.
"""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_glue_data_lake_spark.pydatasource import (
    FEED_SQL,
    CdcFeedReader,
    CdcFeedStreamReader,
    _feed_batch,
)


@settings(max_examples=50, deadline=None)
@given(
    lo=st.integers(min_value=0, max_value=5_000),
    n=st.integers(min_value=0, max_value=2_000),
)
def test_feed_batch_equals_sql_oracle(lo, n):
    batch = _feed_batch(lo, lo + n)
    con = duckdb.connect()
    expect = con.execute(
        f"WITH g AS (SELECT UNNEST(generate_series({lo}, {lo + n - 1})) AS id) "
        + FEED_SQL
        + " ORDER BY id"
    ).fetchall()
    got = [tuple(r.values()) for r in batch.to_pylist()]
    assert got == expect


@settings(max_examples=100, deadline=None)
@given(
    n_rows=st.integers(min_value=0, max_value=100_000),
    n_parts=st.integers(min_value=1, max_value=64),
    lo=st.integers(min_value=0, max_value=100_000),
    hi=st.integers(min_value=0, max_value=100_000),
)
def test_partitions_tile_the_pushed_range(n_rows, n_parts, lo, hi):
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    r = CdcFeedReader({"n_rows": n_rows, "n_parts": n_parts})
    leftover = list(
        r.pushFilters([GreaterThanOrEqual(("id",), lo), LessThan(("id",), hi)])
    )
    assert leftover == []  # both absorbed
    parts = r.partitions()
    span_lo, span_hi = max(0, lo), min(n_rows, hi)
    if span_lo >= span_hi:
        assert parts == [] or all(p.hi <= p.lo for p in parts)
        return
    assert parts[0].lo == span_lo and parts[-1].hi == span_hi
    for a, b in zip(parts, parts[1:]):
        assert a.hi == b.lo  # disjoint and contiguous
    assert len(parts) <= n_parts


@settings(max_examples=50, deadline=None)
@given(
    n_rows=st.integers(min_value=0, max_value=5_000),
    slab=st.integers(min_value=1, max_value=1_500),
)
def test_stream_offset_walk_replays_batch_read(n_rows, slab):
    r = CdcFeedStreamReader({"n_rows": n_rows, "slab": slab})
    offset = r.initialOffset()
    seen = []
    for _ in range(n_rows // slab + 2):
        rows, nxt = r.read(offset)
        rows = list(rows)
        if not rows:
            assert nxt == offset  # finite feed reports no new data
            break
        # recovery replay of the same committed range must be identical
        assert list(r.readBetweenOffsets(offset, nxt)) == rows
        seen.extend(rows)
        r.commit(nxt)
        offset = nxt
    assert seen == [tuple(x.values()) for x in _feed_batch(0, n_rows).to_pylist()]


@settings(max_examples=200, deadline=None)
@given(
    vals=st.lists(
        st.integers(min_value=-10**12, max_value=10**12), min_size=1, max_size=400
    )
)
def test_list_state_median_kernel_matches_numpy(vals):
    arr = np.sort(np.array(vals, dtype="int64"))
    n = len(arr)
    median2 = int(arr[n // 2] + arr[(n - 1) // 2])
    assert median2 == int(round(2 * float(np.median(np.array(vals, dtype="float64")))))
