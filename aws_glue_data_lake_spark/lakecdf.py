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
- **Pinned schema-evolution behavior** (VERDICT r13 item 3): the stream
  schema is pinned at start. A commit whose schema ADDS columns (or
  retypes one) fails the stream loudly at that version — delta-spark's
  behavior without ``schemaTrackingLocation`` — with a message saying to
  restart; files written under OLDER (subset) schemas replay fine, the
  missing columns NULL-backfilled in the Arrow batches (the parquet
  missing-column contract, applied reader-side).
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
    def __init__(self, path: str, fields: list[tuple[str, str]]):
        #: fields: the STREAM-PINNED (name, spark simpleString) list —
        #: the order Spark binds the Arrow batch to, positionally
        self.path, self.fields = path, fields


class LakeCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options, schema=None):
        from aws_glue_data_lake_spark.cdfratelimit import CdfRateLimiter

        path = options.get("path")
        if not path:
            raise ValueError("lake_cdf requires a 'path' option")
        self.table = LakeTable(path)
        from pyspark.sql.types import StructType

        st = schema if schema is not None else StructType.fromDDL(
            self.table.snapshot().schema
        )
        #: the stream's pinned schema: every micro-batch binds to this
        self._fields = [
            (f.name, f.dataType.simpleString()) for f in st.fields
        ]
        mft = options.get("maxFilesPerTrigger") or options.get(
            "maxfilespertrigger"
        )
        ev = options.get("endingVersion") or options.get("endingversion")
        self._limiter = CdfRateLimiter(
            int(mft) if mft is not None else None,
            int(ev) if ev is not None else None,
        )
        self._units: dict[int, list[_FilePartition]] = {}

    def _version_units(self, v: int) -> list[_FilePartition]:
        """Planned unit list for ONE commit (memoized): the files it
        ADDED, in sorted (deterministic, replayable) order. Validation
        of the append-only contract AND the pinned-schema contract
        lives here so both latestOffset's counting and partitions'
        planning hit it."""
        if v in self._units:
            return self._units[v]
        snap = self.table.snapshot(v)
        op = snap.op.split(":", 1)[0]
        if op not in _APPEND_OPS:
            raise ValueError(
                f"lake_cdf is append-only: commit v{v} is {snap.op!r} "
                "(rewrites would re-emit rows; read a fresh snapshot "
                "instead)"
            )
        from aws_glue_data_lake_spark.cdfratelimit import ddl_fields

        pinned = {
            n: t.replace(" ", "").lower() for n, t in self._fields
        }
        wider = [
            (n, t)
            for n, t in ddl_fields(snap.schema)
            if n not in pinned or pinned[n] != t
        ]
        if wider:
            from aws_glue_data_lake_spark.cdfratelimit import (
                schema_changed_error,
            )

            raise schema_changed_error(
                "lake_cdf", v,
                ", ".join(f"{n} {t}" for n, t in self._fields),
                snap.schema,
            )
        prev_files = (
            set(self.table.snapshot(v - 1).file_names) if v > 1 else set()
        )
        units = [
            _FilePartition(self.table._abs(rel), self._fields)
            for rel in sorted(set(snap.file_names) - prev_files)
        ]
        if len(self._units) > 256:  # bound the memo on long streams
            self._units.clear()
        self._units[v] = units
        return units

    def initialOffset(self) -> dict:
        off = {"version": 0, "file": 0}
        self._limiter.seed(off)
        return off

    def latestOffset(self) -> dict:
        # unbounded: the table tip; with maxFilesPerTrigger: advance the
        # cursor by at most that many files, splitting large commits
        # across micro-batches (cdfratelimit module doc)
        return self._limiter.latest(
            self.table.current_version(),
            lambda v: len(self._version_units(v)),
        )

    def partitions(self, start: dict, end: dict):
        from aws_glue_data_lake_spark.cdfratelimit import (
            slice_version_range,
        )

        self._limiter.seed(start)
        self._limiter.seed(end)
        parts: list[_FilePartition] = []
        for v, lo, hi in slice_version_range(start, end):
            units = self._version_units(v)
            parts.extend(units[lo:hi])
        return parts

    def read(self, partition):
        # executes on executors: stream the parquet file's record
        # batches bound to the STREAM-PINNED column order; columns the
        # file predates (written under an older schema) NULL-backfill
        import pyarrow as pa
        import pyarrow.parquet as pq

        from aws_glue_data_lake_spark.cdfratelimit import pa_type_of

        pf = pq.ParquetFile(partition.path)
        have = set(pf.schema_arrow.names)
        present = [n for n, _ in partition.fields if n in have]
        for batch in pf.iter_batches(columns=present):
            by_name = dict(zip(batch.schema.names, batch.columns))
            yield pa.RecordBatch.from_arrays(
                [
                    by_name[n]
                    if n in by_name
                    else pa.nulls(batch.num_rows, type=pa_type_of(t))
                    for n, t in partition.fields
                ],
                names=[n for n, _ in partition.fields],
            )

    def commit(self, end: dict) -> None:
        self._limiter.seed(end)  # snapshots immutable; nothing to free

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
        return LakeCdfStreamReader(self.options, schema)


def register_lake_cdf_source(spark) -> None:
    spark.dataSource.register(LakeCdfDataSource)
