"""Manifest-layer scalability probe (VERDICT r6 item 6): 1k commits over a
1k-file table, delta-log cadence vs full-manifest-every-commit, measuring

- total manifest bytes written across the commit history (the write
  amplification a 100 TB table's metadata layer pays), and
- tip snapshot load time (must be O(current files + checkpoint gap),
  NOT O(all history)).

Pure metadata ops — no Spark, no data files — so the numbers isolate the
log structure itself. Results are recorded in BASELINE.md.

Usage: python scripts/manifest_probe.py [--commits 1000] [--files 1000]
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_glue_data_lake_spark.lake import LakeTable  # noqa: E402


def run(commits: int, files: int, checkpoint_every: int) -> dict:
    root = tempfile.mkdtemp(prefix="manifest_probe_")
    try:
        t = LakeTable(os.path.join(root, "t"))
        os.makedirs(t.path, exist_ok=True)
        t._CHECKPOINT_EVERY = checkpoint_every  # instance override

        def entry(i, gen=0):
            return {
                "path": f"data/f{i:05d}_g{gen}.parquet",
                "rows": 100,
                "stats": {"k": [i * 100, i * 100 + 99]},
            }

        state = {i: entry(i) for i in range(files)}
        t0 = time.monotonic()
        snap = t._commit(list(state.values()), "k long, v long", "create", None)
        # steady state: each commit rewrites ONE file (the CDC upsert shape)
        for c in range(1, commits):
            i = c % files
            state[i] = entry(i, gen=c)
            snap = t._commit(
                list(state.values()), "k long, v long", f"upsert:{c}", snap
            )
        commit_s = time.monotonic() - t0
        total_bytes = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(t._manifests, "v*.json"))
        )
        t1 = time.monotonic()
        tip = t.snapshot()
        load_s = time.monotonic() - t1
        assert len(tip.files) == files
        return {
            "commits": commits,
            "files": files,
            "checkpoint_every": checkpoint_every,
            "commit_total_s": round(commit_s, 2),
            "manifest_mb": round(total_bytes / 1e6, 1),
            "tip_load_s": round(load_s, 4),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--commits", type=int, default=1000)
    ap.add_argument("--files", type=int, default=1000)
    args = ap.parse_args()
    for label, k in (("delta-log (K=20)", 20), ("full-every-commit", 1)):
        r = run(args.commits, args.files, k)
        print(f"{label}: {r}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
