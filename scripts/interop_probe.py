"""Interop-layer scale probe: driver-side metadata costs of the
jar-free Delta/Iceberg layers at file-count scale (the dimension that
grows 1000x on a real lake; data bytes are a plain Spark scan either
way).

Measures, on a synthetic table of N_FILES tiny files across N_PARTS
partitions committed in N_COMMITS increments:

1. Delta log replay (snapshot()) with a long commit tail vs after a
   checkpoint — replay must be O(actions since checkpoint);
2. to_df() PLANNING time: single-scan basePath fast path vs the
   per-partition-group union fallback at the same partition count —
   the fast path's plan must not grow with partition count;
3. deletion-vector read overhead: scan wall-clock with ~1% rows
   tombstoned vs after OPTIMIZE folds the DVs away;
4. Iceberg snapshot() metadata walk across the same commit count
   (manifest list + one manifest per commit).

Usage: python scripts/interop_probe.py [--files 400] [--parts 50]
Prints one JSON line; paste the summary into BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=400)
    ap.add_argument("--parts", type=int, default=50)
    ap.add_argument("--commits", type=int, default=50)
    args = ap.parse_args()

    import pyarrow as pa
    import pyarrow.parquet as pq

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergTableReader,
        IcebergTableWriter,
    )
    from aws_glue_data_lake_spark.session import get_spark

    spark = get_spark("interop-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"files": args.files, "parts": args.parts,
                 "commits": args.commits}
    root = tempfile.mkdtemp(prefix="interop_probe_")

    # -- build a Delta table: N files / N parts across N commits ----------
    dpath = os.path.join(root, "delta")
    os.makedirs(dpath)
    w = DeltaTableWriter(dpath)
    per_commit = max(1, args.files // args.commits)
    import urllib.parse
    import uuid as _uuid

    version = 0
    n_written = 0
    meta_done = False
    rows_per_file = 100
    while n_written < args.files:
        adds = []
        for _ in range(min(per_commit, args.files - n_written)):
            part = n_written % args.parts
            seg = f"p={part}"
            os.makedirs(os.path.join(dpath, seg), exist_ok=True)
            name = f"part-{_uuid.uuid4().hex}.snappy.parquet"
            fp = os.path.join(dpath, seg, name)
            base = n_written * rows_per_file
            pq.write_table(
                pa.table({"k": pa.array(
                    range(base, base + rows_per_file), pa.int64()
                )}),
                fp,
            )
            adds.append(
                {
                    "path": urllib.parse.quote(f"{seg}/{name}"),
                    "partitionValues": {"p": str(part)},
                    "size": os.path.getsize(fp),
                    "modificationTime": 0,
                    "dataChange": True,
                }
            )
            n_written += 1
        actions = [{"add": a} for a in adds]
        if not meta_done:
            from pyspark.sql.types import (
                LongType,
                StructField,
                StructType,
                StringType,
            )

            schema = StructType(
                [
                    StructField("k", LongType()),
                    StructField("p", StringType()),
                ]
            )
            actions = w._meta_actions(schema, ["p"]) + actions
            # the first measurement below is replay cost WITHOUT any
            # checkpoint — disable the writer's automatic interval-10
            # checkpoints so the long commit tail actually exists
            actions[1]["metaData"]["configuration"] = {
                "delta.checkpointInterval": "0"
            }
            meta_done = True
        w._commit(version, actions)
        version += 1

    r = DeltaTableReader(dpath)
    t0 = time.perf_counter()
    snap = r.snapshot()
    out["delta_replay_no_checkpoint_s"] = round(time.perf_counter() - t0, 4)
    assert len(snap.files) == args.files
    w.checkpoint()
    w._commit(version, [], operation="WRITE")  # one post-checkpoint commit
    t0 = time.perf_counter()
    r.snapshot()
    out["delta_replay_after_checkpoint_s"] = round(time.perf_counter() - t0, 4)

    # -- planning: fast path vs forced fallback ---------------------------
    t0 = time.perf_counter()
    df_fast = r.to_df(spark)
    plan_fast = df_fast._jdf.queryExecution().executedPlan().toString()
    out["delta_plan_fastpath_s"] = round(time.perf_counter() - t0, 4)
    out["delta_plan_fastpath_scans"] = plan_fast.count("Scan parquet")
    out["delta_plan_fastpath_chars"] = len(plan_fast)
    orig = DeltaTableReader._hive_layout_consistent
    try:
        DeltaTableReader._hive_layout_consistent = lambda self, s: False
        t0 = time.perf_counter()
        df_slow = r.to_df(spark)
        plan_slow = df_slow._jdf.queryExecution().executedPlan().toString()
        out["delta_plan_fallback_s"] = round(time.perf_counter() - t0, 4)
        out["delta_plan_fallback_scans"] = plan_slow.count("Scan parquet")
        out["delta_plan_fallback_chars"] = len(plan_slow)
    finally:
        DeltaTableReader._hive_layout_consistent = orig
    n_total = args.files * rows_per_file
    assert df_fast.count() == n_total

    # -- CDF: full-history changes() over the 50-commit add-only log --------
    # (before the DV mutations below, which are pre-CDF-enablement
    # rewrites and therefore — correctly — unreplayable)
    t0 = time.perf_counter()
    feed = r.changes(spark)
    out["delta_cdf_plan_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    out["delta_cdf_rows"] = feed.count()
    out["delta_cdf_count_s"] = round(time.perf_counter() - t0, 4)
    assert out["delta_cdf_rows"] == n_total

    # -- DV read overhead (warm: 2nd of two runs, the 1st pays one-off
    # job-scheduling + code-gen costs) --------------------------------------
    def warm_count(df_factory):
        df_factory().count()
        t0 = time.perf_counter()
        n = df_factory().count()
        return n, round(time.perf_counter() - t0, 4)

    base_count, out["delta_scan_no_dv_s"] = warm_count(lambda: r.to_df(spark))
    w2 = DeltaTableWriter(dpath)
    w2.delete_where(spark, "k % 100 = 0")  # ~1% of rows, every file
    dv_count, out["delta_scan_with_dv_s"] = warm_count(lambda: r.to_df(spark))
    assert dv_count == base_count - args.files  # one k%100==0 per file
    w2.optimize(spark, target_files=args.parts)
    folded, out["delta_scan_after_optimize_s"] = warm_count(
        lambda: r.to_df(spark)
    )
    assert folded == dv_count

    # -- long-tail replay: checkpoint's raison d'etre ----------------------
    lpath = os.path.join(root, "delta_long")
    os.makedirs(lpath)
    wl = DeltaTableWriter(lpath)
    from pyspark.sql.types import LongType as _L, StructField as _F, StructType as _S

    seg = "f.parquet"
    pq.write_table(pa.table({"k": pa.array([1], pa.int64())}),
                   os.path.join(lpath, seg))
    long_meta = wl._meta_actions(_S([_F("k", _L())]), [])
    # the point is a LONG uncheckpointed tail: disable the writer's
    # automatic interval-10 checkpoints for this table
    long_meta[1]["metaData"]["configuration"] = {
        "delta.checkpointInterval": "0"
    }
    wl._commit(0, long_meta + [
        {"add": {"path": seg, "partitionValues": {}, "size": 8,
                 "modificationTime": 0, "dataChange": True}}])
    n_tail = 1000
    for v in range(1, n_tail):
        wl._commit(v, [])  # empty commits: a pure log-length tail
    rl = DeltaTableReader(lpath)
    t0 = time.perf_counter()
    rl.snapshot()
    out["delta_replay_1000_commits_s"] = round(time.perf_counter() - t0, 4)
    wl.checkpoint()
    wl._commit(n_tail, [])
    t0 = time.perf_counter()
    rl.snapshot()
    out["delta_replay_1000_after_checkpoint_s"] = round(
        time.perf_counter() - t0, 4
    )

    # -- Iceberg metadata walk across the same commit count ---------------
    ipath = os.path.join(root, "ice")
    iw = IcebergTableWriter(ipath)
    first = spark.range(0, 100).selectExpr("id as k")
    iw.create(first.coalesce(1))
    for i in range(1, args.commits):
        iw.append(
            spark.range(i * 100, i * 100 + 100)
            .selectExpr("id as k")
            .coalesce(1)
        )
    ir = IcebergTableReader(ipath)
    t0 = time.perf_counter()
    isnap = ir.snapshot()
    out["iceberg_snapshot_walk_s"] = round(time.perf_counter() - t0, 4)
    assert len(isnap.files) == args.commits
    assert ir.to_df(spark).count() == args.commits * 100

    # -- Iceberg changelog over the same append-only snapshot chain --------
    t0 = time.perf_counter()
    ifeed = ir.changes(spark)
    out["iceberg_changelog_plan_s"] = round(time.perf_counter() - t0, 4)
    t0 = time.perf_counter()
    out["iceberg_changelog_rows"] = ifeed.count()
    out["iceberg_changelog_count_s"] = round(time.perf_counter() - t0, 4)
    assert out["iceberg_changelog_rows"] == args.commits * 100

    # -- MERGE at file-count scale ----------------------------------------
    # Delta: copy-on-write MERGE must rewrite only the files whose
    # add.stats key-range overlaps the batch — on a range-laid-out
    # table, a narrow batch touches O(1) of the files.
    mpath = os.path.join(root, "delta_merge")
    mw = DeltaTableWriter(mpath)
    big = (
        spark.range(0, 40_000)
        .selectExpr("id as k", "id * 2 as v")
        .repartitionByRange(32, "k")
        .sortWithinPartitions("k")
    )
    mw.create(big)
    src = spark.range(100, 200).selectExpr("id as k", "id * 100 as v")
    t0 = time.perf_counter()
    mv = mw.merge(spark, src, keys=["k"])
    out["delta_merge_narrow_batch_s"] = round(time.perf_counter() - t0, 4)
    with open(
        os.path.join(mpath, "_delta_log", f"{mv:020d}.json")
    ) as fh:
        acts = [json.loads(x) for x in fh if x.strip()]
    out["delta_merge_files_rewritten"] = sum(1 for a in acts if "remove" in a)
    out["delta_merge_files_total"] = 32
    assert out["delta_merge_files_rewritten"] <= 4  # stats pruning works
    mr = DeltaTableReader(mpath)
    assert mr.to_df(spark).count() == 40_000

    # Iceberg: merge-on-read MERGE is O(batch) — no data file is
    # rewritten regardless of table size; the snapshot grows by the
    # batch's files plus one equality-delete file.
    files_before = len(ir.snapshot().files)
    t0 = time.perf_counter()
    iw.merge(
        spark.range(0, 100).selectExpr("id as k").coalesce(1), keys=["k"]
    )
    out["iceberg_merge_batch_s"] = round(time.perf_counter() - t0, 4)
    isnap2 = ir.snapshot()
    out["iceberg_merge_data_files_added"] = (
        len(isnap2.files) - files_before
    )
    assert out["iceberg_merge_data_files_added"] == 1  # never a rewrite
    assert ir.to_df(spark).count() == args.commits * 100

    shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
