"""As-of (point-in-time) join — an operator vanilla Spark lacks, built as a
composition of built-in ops (SURVEY.md guidance: prefer composition over
UDFs over custom rules). The reference has no as-of join; this is an
engine addition for the time-series/feature-lookup family.

Semantics: for each left row, attach the payload of the *latest* right row
with the same key and ``right.time <= left.time`` (ties at equal time match
— "at or before").

Implementation — the union-and-carry pattern, not a per-key loop and not a
range cross-join:

1. tag both sides and union them into one (key, time, side, payload) stream;
2. one window, partitioned by key, ordered by (time, side, tiebreak) with a
   running frame; ``last(payload, ignorenulls=True)`` carries the most
   recent right payload forward past each left row;
3. filter back to left rows.

Scale notes (100 TB): exactly ONE shuffle, keyed on the join key — the
same exchange a plain equi-join would need — then a per-partition ordered
scan. No range-duplicated rows, no skew amplification beyond the key's own
frequency (salt hot keys upstream if needed). Contrast with the naive
``left JOIN right ON key AND r.t <= l.t`` + argmax, which materializes
every (left, earlier-right) pair before pruning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload: Sequence[str],
    tiebreak: str,
    direction: str = "backward",
    tolerance: int | None = None,
) -> DataFrame:
    """Return ``left`` with ``payload`` columns from the as-of-matched right
    row (NULL when no right row qualifies).

    ``direction`` selects the match:
    - ``"backward"`` (default): latest right row with ``right.time <=
      left.time`` — the classic as-of lookup;
    - ``"forward"``: earliest right row with ``right.time >= left.time``;
    - ``"nearest"``: whichever of the two is closer in time (exact ties go
      backward — the information-leak-free default). The extra column
      ``_asof_direction`` ('B'/'F'/NULL) reports which side matched.

    ``tiebreak`` is a right-side column giving a deterministic winner among
    right rows that share (key, time): latest wins backward, earliest wins
    forward.

    All three directions keep the single-shuffle plan: nearest adds a
    second Window over the SAME key partitioning (one exchange, two
    in-partition sorts), never a second shuffle.

    ``tolerance`` (same unit as the time columns; typically epoch-µs)
    bounds the match distance, as in pandas ``merge_asof(tolerance=...)``:
    a carried right row farther than ``tolerance`` from the left row's
    time yields NULL payload instead — applied per side BEFORE nearest
    chooses, so nearest falls back to the other side when only one is in
    range. Plan-neutral: the bound is a scan-side predicate on the
    already-carried times, never a join condition.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown asof direction {direction!r}")
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        "*",
        *[F.lit(None).cast(right.schema[p].dataType).alias(p) for p in payload],
        F.lit(None).cast("long").alias("_rt"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(tiebreak).cast("long").alias("_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns],
        *payload,
        F.col(right_time).cast("long").alias("_rt"),
    )
    unioned = l_tag.unionByName(r_tag)
    carry = list(payload) + ["_rt"]
    # Backward: right rows sort before left rows at equal time (_side 0 <
    # 1), so an exactly-simultaneous right row is visible to the left row;
    # _tb orders simultaneous right rows so the LAST one wins.
    wb = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward mirror: left rows sort before right rows at equal time
    # (1 - _side), so the simultaneous right row is in the following
    # frame; the FIRST simultaneous right row (smallest _tb) wins.
    wf = (
        Window.partitionBy("_k")
        .orderBy("_t", (1 - F.col("_side")), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    def _b_ok():
        ok = F.col("_b__rt").isNotNull()
        if tolerance is not None:
            ok = ok & ((F.col("_t") - F.col("_b__rt")) <= F.lit(tolerance))
        return ok

    def _f_ok():
        ok = F.col("_f__rt").isNotNull()
        if tolerance is not None:
            ok = ok & ((F.col("_f__rt") - F.col("_t")) <= F.lit(tolerance))
        return ok

    if direction == "backward":
        carried = unioned.select(
            "*",
            *[F.last(p, ignorenulls=True).over(wb).alias(f"_b_{p}") for p in carry],
        )
        picked = [
            F.when(_b_ok(), F.col(f"_b_{p}")).alias(p) for p in payload
        ]
    elif direction == "forward":
        carried = unioned.select(
            "*",
            *[F.first(p, ignorenulls=True).over(wf).alias(f"_f_{p}") for p in carry],
        )
        picked = [
            F.when(_f_ok(), F.col(f"_f_{p}")).alias(p) for p in payload
        ]
    else:  # nearest
        carried = unioned.select(
            "*",
            *[F.last(p, ignorenulls=True).over(wb).alias(f"_b_{p}") for p in carry],
            *[F.first(p, ignorenulls=True).over(wf).alias(f"_f_{p}") for p in carry],
        )
        bt, ft = F.col("_b__rt"), F.col("_f__rt")
        b_ok, f_ok = _b_ok(), _f_ok()
        use_f = f_ok & (
            ~b_ok | ((ft - F.col("_t")) < (F.col("_t") - bt))
        )
        picked = [
            F.when(use_f, F.col(f"_f_{p}"))
            .when(b_ok, F.col(f"_b_{p}"))
            .alias(p)
            for p in payload
        ] + [
            F.when(use_f, F.lit("F"))
            .when(b_ok, F.lit("B"))
            .otherwise(F.lit(None).cast("string"))
            .alias("_asof_direction")
        ]
    return (
        carried.where(F.col("_side") == 1)
        .select(*left.columns, *picked)
    )
