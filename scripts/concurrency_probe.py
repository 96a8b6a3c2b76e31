"""Concurrency scale probe (VERDICT r8 item 1 'done' criterion): do
concurrent disjoint-partition writers ALL land via conflict-aware
rebase, and does the rebase overhead stay batch-proportional when the
TABLE grows 10x?

Setup per scale: a Delta table partitioned by `part` (P partitions,
~F files) and an unpartitioned Iceberg table of the same rows. Then
T threads each MERGE a small batch into a DISTINCT partition (Delta,
copy-on-write with key-range + partition-value conflict checks) /
distinct key range (Iceberg, merge-on-read — rebases over any data
winner). Reported per scale:

- landed: how many of the T merges committed (must be T — the pre-r9
  writer aborted all but the first);
- versions: Delta tip version delta (== T when every loser rebased
  instead of aborting);
- wall_s: end-to-end wall for the T concurrent merges.

The 10x table must not make the race resolution 10x slower: conflict
validation reads only the winners' commit JSONs / snapshot diffs
(O(#winners) metadata), and each merge rewrites only its own
partition's files. Usage: python scripts/concurrency_probe.py
[--threads 4] [--parts 8]. Prints one JSON line; summary goes to
BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, "/root/repo")


def run_scale(spark, root: str, rows: int, parts: int, threads: int) -> dict:
    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )
    from aws_glue_data_lake_spark.icebergcompat import (
        IcebergTableReader,
        IcebergTableWriter,
    )

    base = (
        spark.range(rows)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % parts).cast("string").alias("part"),
            (F.col("id") * 2).alias("v"),
        )
        .repartition(parts, "part")
    )
    dpath, ipath = f"{root}/delta", f"{root}/iceberg"
    DeltaTableWriter(dpath).create(base, partition_by=["part"])
    IcebergTableWriter(ipath).create(base.drop("part"))

    def batch(i: int, tag: str):
        return spark.range(rows + i * 100, rows + i * 100 + 50).select(
            F.col("id").alias("k"),
            F.lit(str(i)).alias("part"),
            F.lit(-1).cast("long").alias("v"),
        )

    out: dict = {"rows": rows, "parts": parts, "threads": threads}
    for fmt, writer_cls, merge in (
        (
            "delta",
            DeltaTableWriter,
            lambda w, i: w.merge(
                spark, batch(i, "d"), keys=["part", "k"]
            ),
        ),
        (
            "iceberg",
            IcebergTableWriter,
            lambda w, i: w.merge(batch(i, "i").drop("part"), keys=["k"]),
        ),
    ):
        errs: list = []
        path = dpath if fmt == "delta" else ipath
        v0 = (
            DeltaTableReader(dpath).snapshot().version
            if fmt == "delta"
            else len(IcebergTableReader(ipath)._metadata()["snapshots"])
        )

        def work(i, _merge=merge, _path=path, _cls=writer_cls):
            try:
                _merge(_cls(_path), i)
            except Exception as e:  # noqa: BLE001 — counted, reported
                errs.append(repr(e)[:120])

        t0 = time.time()
        ts = [
            threading.Thread(target=work, args=(i,))
            for i in range(threads)
        ]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        wall = time.time() - t0
        if fmt == "delta":
            v1 = DeltaTableReader(dpath).snapshot().version
            n = DeltaTableReader(dpath).to_df(spark).count()
        else:
            v1 = len(IcebergTableReader(ipath)._metadata()["snapshots"])
            n = IcebergTableReader(ipath).to_df(spark).count()
        out[fmt] = {
            "landed": threads - len(errs),
            "errors": errs,
            "commits": v1 - v0,
            "rows_after": n,
            "wall_s": round(wall, 2),
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", type=int, default=4)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--rows", type=int, default=20_000)
    args = ap.parse_args()

    from aws_glue_data_lake_spark.session import get_spark

    spark = get_spark("concurrency-probe")
    spark.sparkContext.setLogLevel("ERROR")
    result = {"threads": args.threads}
    for label, rows in (("1x", args.rows), ("10x", args.rows * 10)):
        root = tempfile.mkdtemp(prefix=f"conc_probe_{label}_")
        try:
            result[label] = run_scale(
                spark, root, rows, args.parts, args.threads
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    for fmt in ("delta", "iceberg"):
        w1, w10 = result["1x"][fmt]["wall_s"], result["10x"][fmt]["wall_s"]
        result[f"{fmt}_wall_ratio_10x"] = round(w10 / max(w1, 1e-9), 2)
    print(json.dumps(result))
    ok = all(
        result[sc][fmt]["landed"] == args.threads
        for sc in ("1x", "10x")
        for fmt in ("delta", "iceberg")
    )
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
