"""Change-data-feed STREAMING SOURCE over the lake commit log — the
synthesis of the lake and connector layers: every committed snapshot
version is one micro-batch, so a downstream streaming query incrementally
consumes table changes without rescanning (Delta's ``readChangeFeed`` /
Iceberg's incremental read, built on the Python DataSource API).

Design, scale-first:

- **Offsets are snapshot versions** (``{"version": N}``): monotonic,
  replayable, and exactly the unit the table's own commit protocol makes
  atomic. Each micro-batch covers every version committed since the
  last one (``latestOffset`` returns the tip), planned as one
  file-partition set — per-commit attribution stays exact because the
  manifest diff is taken version by version.
- **Executor-side file reads.** This is the FULL ``DataSourceStreamReader``
  (not the prefetching Simple variant): ``partitions(start, end)`` plans
  one :class:`InputPartition` per data file ADDED in the version range
  (manifest set difference — no directory listing), and ``read`` runs on
  executors, streaming each file's Arrow record batches. The driver only
  ever touches manifests.
- **Append-only contract.** The feed emits rows from files added by each
  commit. For rewrite commits (upsert/merge/compact) that would re-emit
  rewritten rows, so those ops raise — matching Delta's CDF default,
  which requires explicit handling for non-append changes. Deletion-
  vector commits add no files and emit nothing (deletes are not fed).
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

from aws_glue_data_lake_spark.lake import LakeTable

#: Commit ops whose added files are pure row additions.
_APPEND_OPS = ("create", "append", "add-constraint", "delete-dv",
               "drop-constraint")


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path, self.columns = path, columns


class LakeCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("lake_cdf requires a 'path' option")
        self.table = LakeTable(path)

    def initialOffset(self) -> dict:
        return {"version": 0}

    def latestOffset(self) -> dict:
        cur = self.table.current_version()
        # one committed version per micro-batch; stay put when drained
        return {"version": cur}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[_FilePartition] = []
        prev_files = (
            set(self.table.snapshot(lo).file_names) if lo >= 1 else set()
        )
        for v in range(lo + 1, hi + 1):
            snap = self.table.snapshot(v)
            op = snap.op.split(":", 1)[0]
            if op not in _APPEND_OPS:
                raise ValueError(
                    f"lake_cdf is append-only: commit v{v} is {snap.op!r} "
                    "(rewrites would re-emit rows; read a fresh snapshot "
                    "instead)"
                )
            cols = [
                f.split(" ", 1)[0].strip("`")
                for f in snap.schema.split(",")
            ]
            cur_files = set(snap.file_names)
            for rel in sorted(cur_files - prev_files):
                parts.append(
                    _FilePartition(self.table._abs(rel), cols)
                )
            prev_files = cur_files
        return parts

    def read(self, partition):
        # executes on executors: stream the parquet file's record batches
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        for batch in pf.iter_batches():
            yield batch

    def commit(self, end: dict) -> None:
        pass  # snapshots are immutable; nothing to release

    def stop(self) -> None:
        pass


class LakeCdfDataSource(DataSource):
    """``spark.readStream.format("lake_cdf").option("path", table_root)``
    after ``spark.dataSource.register(LakeCdfDataSource)``."""

    @classmethod
    def name(cls):
        return "lake_cdf"

    def schema(self):
        path = self.options.get("path")
        if not path or not os.path.isdir(path):
            raise ValueError(f"lake_cdf: no lake table at {path!r}")
        return LakeTable(path).snapshot().schema

    def streamReader(self, schema):
        return LakeCdfStreamReader(self.options)


def register_lake_cdf_source(spark) -> None:
    spark.dataSource.register(LakeCdfDataSource)
