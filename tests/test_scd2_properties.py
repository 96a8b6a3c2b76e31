"""Property-based invariants for the SCD type-2 transform
(queries/cdc_queries.scd2_history) against a brute-force Python replay:
for ANY change feed, the version table must partition each key's
timeline correctly — non-overlapping ordered intervals, deletes closing
without opening, exactly one current row iff the key's last change is
not a delete."""

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_glue_data_lake_spark.queries.cdc_queries import scd2_history

OPS = [None, "I", "U", "D"]

#: (user_id, ts_us, op_index) triples; event_id = position in the list so
#: ties on (user_id, ts_us) are resolved identically in both replayers.
feeds = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # few keys → collisions
        st.integers(min_value=0, max_value=5),    # tiny ts domain → ties
        st.integers(min_value=0, max_value=3),
    ),
    min_size=0,
    max_size=12,
)


def brute_force(rows):
    """Reference replay: per key, order by (ts, event_id); every non-D
    change opens a version closed by the next change of any op."""
    by_key = {}
    for event_id, (uid, ts, opi) in enumerate(rows):
        by_key.setdefault(uid, []).append((ts, event_id, OPS[opi]))
    expected = set()
    for uid, changes in by_key.items():
        changes.sort(key=lambda c: (c[0], c[1]))
        version = 0
        for i, (ts, event_id, op) in enumerate(changes):
            if op == "D":
                continue
            version += 1
            nxt = changes[i + 1][0] if i + 1 < len(changes) else None
            expected.add((uid, version, event_id, ts, nxt,
                          1 if nxt is None else 0))
    return expected


@settings(max_examples=25, deadline=None)
@given(feeds)
def test_scd2_matches_brute_force(spark, rows):
    feed = spark.createDataFrame(
        [
            (uid, event_id, f"t{opi}", OPS[opi], ts)
            for event_id, (uid, ts, opi) in enumerate(rows)
        ],
        "user_id long, event_id long, event_type string, op string, ts_us long",
    )
    got = {
        (r["user_id"], r["version"], r["event_id"], r["valid_from_us"],
         r["valid_to_us"], r["is_current"])
        for r in scd2_history(feed).collect()
    }
    assert got == brute_force(rows)


@settings(max_examples=15, deadline=None)
@given(feeds)
def test_scd2_interval_invariants(spark, rows):
    feed = spark.createDataFrame(
        [
            (uid, event_id, f"t{opi}", OPS[opi], ts)
            for event_id, (uid, ts, opi) in enumerate(rows)
        ],
        "user_id long, event_id long, event_type string, op string, ts_us long",
    )
    out = scd2_history(feed).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["user_id"], []).append(r)
    for uid, vs in by_key.items():
        vs.sort(key=lambda r: r["version"])
        # versions are 1..n dense
        assert [r["version"] for r in vs] == list(range(1, len(vs) + 1))
        for r in vs:
            # intervals never run backwards; current ⟺ open-ended
            if r["valid_to_us"] is not None:
                assert r["valid_to_us"] >= r["valid_from_us"]
            assert (r["is_current"] == 1) == (r["valid_to_us"] is None)
        # at most one current version per key
        assert sum(r["is_current"] for r in vs) <= 1
        # non-overlap: next version starts at or after previous close
        for a, b in zip(vs, vs[1:]):
            assert a["valid_to_us"] is not None
            assert b["valid_from_us"] >= a["valid_to_us"]
