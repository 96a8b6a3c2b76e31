"""Property-based check of operators/asof.py against a brute-force Python
replay: for ANY left/right point sets (few keys, tiny time domain — tie
collisions guaranteed), each direction must pick exactly the row the
definition names: backward = latest at-or-before (max tiebreak among
simultaneous), forward = earliest at-or-after (min tiebreak), nearest =
smaller gap with exact ties going backward."""

from hypothesis import given, settings
from hypothesis import strategies as st

from aws_glue_data_lake_spark.operators.asof import asof_join

#: left rows: (key, t); right rows: (key, t, value) — rid = list position.
lefts = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 6)), min_size=1, max_size=8
)
rights = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 6)), min_size=0, max_size=8
)


def brute(l_rows, r_rows, direction):
    out = {}
    for lid, (k, t) in enumerate(l_rows):
        back = [(rt, rid) for rid, (rk, rt) in enumerate(r_rows)
                if rk == k and rt <= t]
        fwd = [(rt, rid) for rid, (rk, rt) in enumerate(r_rows)
               if rk == k and rt >= t]
        b = max(back, key=lambda x: (x[0], x[1]))[1] if back else None
        f = min(fwd, key=lambda x: (x[0], x[1]))[1] if fwd else None
        if direction == "backward":
            out[lid] = b
        elif direction == "forward":
            out[lid] = f
        else:
            if b is None and f is None:
                out[lid] = None
            elif b is None:
                out[lid] = f
            elif f is None:
                out[lid] = b
            else:
                bt = next(rt for rid, (rk, rt) in enumerate(r_rows) if rid == b)
                ft = next(rt for rid, (rk, rt) in enumerate(r_rows) if rid == f)
                out[lid] = f if (ft - t) < (t - bt) else b
    return out


@settings(max_examples=20, deadline=None)
@given(l_rows=lefts, r_rows=rights)
def test_asof_all_directions_match_brute_force(spark, l_rows, r_rows):
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(l_rows)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(r_rows)],
        "rid long, k long, rt long",
    ) if r_rows else spark.createDataFrame([], "rid long, k long, rt long")
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, key="k", left_time="t", right_time="rt",
                payload=["rid"], tiebreak="rid", direction=direction,
            ).collect()
        }
        assert got == brute(l_rows, r_rows, direction), direction


def brute_tol(l_rows, r_rows, direction, tol):
    """Brute force with a staleness bound: candidates farther than ``tol``
    are excluded per side BEFORE nearest chooses."""
    out = {}
    for lid, (k, t) in enumerate(l_rows):
        back = [(rt, rid) for rid, (rk, rt) in enumerate(r_rows)
                if rk == k and rt <= t and t - rt <= tol]
        fwd = [(rt, rid) for rid, (rk, rt) in enumerate(r_rows)
               if rk == k and rt >= t and rt - t <= tol]
        b = max(back, key=lambda x: (x[0], x[1]))[1] if back else None
        f = min(fwd, key=lambda x: (x[0], x[1]))[1] if fwd else None
        if direction == "backward":
            out[lid] = b
        elif direction == "forward":
            out[lid] = f
        else:
            if b is None:
                out[lid] = f
            elif f is None:
                out[lid] = b
            else:
                bt = next(rt for rid, (rk, rt) in enumerate(r_rows) if rid == b)
                ft = next(rt for rid, (rk, rt) in enumerate(r_rows) if rid == f)
                out[lid] = f if (ft - t) < (t - bt) else b
    return out


@settings(max_examples=15, deadline=None)
@given(l_rows=lefts, r_rows=rights, tol=st.integers(0, 3))
def test_asof_tolerance_matches_brute_force(spark, l_rows, r_rows, tol):
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(l_rows)], "lid long, k long, t long"
    )
    right = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(r_rows)],
        "rid long, k long, rt long",
    ) if r_rows else spark.createDataFrame([], "rid long, k long, rt long")
    for direction in ("backward", "forward", "nearest"):
        got = {
            r["lid"]: r["rid"]
            for r in asof_join(
                left, right, key="k", left_time="t", right_time="rt",
                payload=["rid"], tiebreak="rid", direction=direction,
                tolerance=tol,
            ).collect()
        }
        assert got == brute_tol(l_rows, r_rows, direction, tol), direction
