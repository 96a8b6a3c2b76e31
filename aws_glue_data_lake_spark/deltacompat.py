"""Delta Lake transaction-log compatibility — jar-free, read AND write.

The reference engine's destination *is* a Delta table
(reference delta/delta_tables.py:8 ``from delta.tables import *``, :131
``write.format("delta")``): a user switching from it holds real
``_delta_log`` tables. This module speaks the PUBLIC Delta transaction
log protocol (https://github.com/delta-io/delta/blob/master/PROTOCOL.md)
with no delta-spark jars:

- ``DeltaTableReader`` replays ``_delta_log/*.json`` commits (and
  ``*.checkpoint.parquet`` checkpoints) into a file list + schema and
  plans a normal Spark parquet scan over exactly the live files —
  add/remove actions, partition-column reconstruction from
  ``partitionValues``, time travel by version, columnMapping=name
  (physical-name files aliased back to the logical schema — the
  Databricks-written-table layout), protocol gating.
- ``DeltaTableWriter`` emits the same protocol (reader version 1,
  writer version 2): atomic ``O_EXCL`` commit JSONs, url-encoded
  relative paths, Hive-layout partition dirs, classic parquet
  checkpoints — so anything this engine exports is readable by
  delta-spark / DuckDB's delta extension / Athena.

Scale note: log replay is O(#actions since last checkpoint) driver-side
metadata work — the same contract as delta-spark's Snapshot — and the
data scan itself is a plain distributed parquet read with the usual
pushdown/pruning. Partition values ride the manifest (the log), never
the data files, matching Delta's layout.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
import uuid
from dataclasses import dataclass
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

#: Reader features this implementation actually honors (protocol §
#: "reader version 3"). Anything else in readerFeatures must hard-fail:
#: silently ignoring deletionVectors or columnMapping would return wrong
#: rows, the protocol's cardinal sin.
_SUPPORTED_READER_FEATURES = {"timestampNtz", "columnMapping"}

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CHECKPOINT_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")


class DeltaProtocolError(NotImplementedError):
    """Table requires a reader capability this implementation lacks."""


@dataclass
class DeltaSnapshot:
    version: int
    schema: StructType
    partition_columns: tuple[str, ...]
    #: live files: (absolute path, {partition col: raw string or None})
    files: list[tuple[str, dict]]
    configuration: dict


class DeltaTableReader:
    """Replay a ``_delta_log`` into a snapshot and scan it with Spark."""

    def __init__(self, path: str):
        self.path = path
        self._log = os.path.join(path, "_delta_log")
        if not os.path.isdir(self._log):
            raise FileNotFoundError(f"no _delta_log under {path}")

    # -- log listing --------------------------------------------------------
    def _commit_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._log):
            m = _COMMIT_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _checkpoint_versions(self) -> list[int]:
        out = []
        for name in os.listdir(self._log):
            m = _CHECKPOINT_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def latest_version(self) -> int:
        versions = self._commit_versions() + self._checkpoint_versions()
        if not versions:
            raise FileNotFoundError(f"empty _delta_log under {self.path}")
        return max(versions)

    # -- replay -------------------------------------------------------------
    def _apply_action(self, state: dict, action: dict) -> None:
        if "metaData" in action:
            state["metaData"] = action["metaData"]
        elif "protocol" in action:
            state["protocol"] = action["protocol"]
        elif "add" in action:
            a = action["add"]
            state["files"][a["path"]] = a.get("partitionValues", {}) or {}
        elif "remove" in action:
            state["files"].pop(action["remove"]["path"], None)
        # commitInfo / txn / cdc / domainMetadata: not needed for a scan

    @staticmethod
    def _plain(val):
        """pyarrow surfaces parquet MAP columns as [(k, v), ...] pair
        lists in to_pylist(); normalize them (recursively) to dicts."""
        if isinstance(val, list) and val and all(
            isinstance(x, tuple) and len(x) == 2 for x in val
        ):
            return {k: DeltaTableReader._plain(v) for k, v in val}
        if isinstance(val, dict):
            return {k: DeltaTableReader._plain(v) for k, v in val.items()}
        return val

    def _load_checkpoint(self, state: dict, version: int) -> None:
        import pyarrow.parquet as pq

        cp = os.path.join(self._log, f"{version:020d}.checkpoint.parquet")
        tbl = pq.read_table(cp)
        rows = tbl.to_pylist()
        # A checkpoint row has exactly one non-null action column.
        for row in rows:
            for key in ("metaData", "protocol", "add", "remove"):
                val = row.get(key)
                if val is not None:
                    self._apply_action(state, {key: self._plain(val)})

    def snapshot(self, version: int | None = None) -> DeltaSnapshot:
        commits = self._commit_versions()
        cps = self._checkpoint_versions()
        if not commits and not cps:
            raise FileNotFoundError(f"empty _delta_log under {self.path}")
        # Pre-checkpoint commit JSONs may be cleaned up (the protocol's
        # log-retention story): any version covered by a commit file OR a
        # checkpoint is replayable.
        tip = max(commits + cps) if version is None else version
        if tip not in commits and tip not in cps:
            raise FileNotFoundError(
                f"no version {tip} in {self._log} (have {sorted(set(commits + cps))})"
            )
        state: dict = {"files": {}, "metaData": None, "protocol": None}
        start = 0
        usable_cps = [cp for cp in self._checkpoint_versions() if cp <= tip]
        if usable_cps:
            cp = usable_cps[-1]
            self._load_checkpoint(state, cp)
            start = cp + 1
        for v in commits:
            if start <= v <= tip:
                with open(os.path.join(self._log, f"{v:020d}.json")) as f:
                    for line in f:
                        line = line.strip()
                        if line:
                            self._apply_action(state, json.loads(line))
        self._check_protocol(state)
        meta = state["metaData"]
        if meta is None:
            raise DeltaProtocolError(f"no metaData action by v{tip}")
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        part_cols = tuple(meta.get("partitionColumns", ()))
        files = [
            (self._abs_path(p), pv) for p, pv in sorted(state["files"].items())
        ]
        return DeltaSnapshot(
            version=tip,
            schema=schema,
            partition_columns=part_cols,
            files=files,
            configuration=meta.get("configuration", {}) or {},
        )

    def _abs_path(self, raw: str) -> str:
        # add.path is a RELATIVE url-encoded path (or an absolute URI).
        p = urllib.parse.unquote(raw)
        if p.startswith("file:"):
            p = urllib.parse.urlparse(p).path
        if os.path.isabs(p):
            return p
        return os.path.join(self.path, p)

    def _check_protocol(self, state: dict) -> None:
        proto = state.get("protocol") or {}
        reader = proto.get("minReaderVersion", 1)
        if reader >= 3:
            feats = set(proto.get("readerFeatures", ()))
            bad = feats - _SUPPORTED_READER_FEATURES
            if bad:
                raise DeltaProtocolError(
                    f"unsupported Delta reader features: {sorted(bad)}"
                )
        elif reader > 2:
            raise DeltaProtocolError(
                f"unsupported minReaderVersion {reader}"
            )
        meta = state.get("metaData") or {}
        conf = meta.get("configuration", {}) or {}
        mode = conf.get("delta.columnMapping.mode", "none")
        if mode not in ("none", "name"):
            # 'id' mode reads by parquet field id, which this scan path
            # doesn't implement — refuse rather than mis-resolve columns
            raise DeltaProtocolError(
                f"column mapping mode {mode!r} not supported (only "
                "'none' and 'name')"
            )

    @staticmethod
    def _physical_name(field) -> str:
        """Logical -> physical column name under columnMapping=name
        (Databricks-written tables store uuid-ish physical names in the
        schemaString field metadata; file bytes AND partitionValues use
        the physical names, the log's partitionColumns the logical)."""
        md = field.metadata or {}
        return md.get("delta.columnMapping.physicalName", field.name)

    # -- scan ---------------------------------------------------------------
    def to_df(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Plan a Spark scan of exactly the snapshot's live files. Partition
        columns are NOT in the data files (Delta's layout) — they attach as
        typed literals from each add-action's ``partitionValues``, grouped
        by partition tuple so planning is O(#live partitions). Under
        columnMapping=name the scan reads the files' PHYSICAL names and
        aliases back to the logical schema."""
        snap = self.snapshot(version)
        if not snap.files:
            return spark.createDataFrame([], snap.schema)
        part_cols = snap.partition_columns
        phys = self._physical_name
        data_fields = [f for f in snap.schema.fields if f.name not in part_cols]
        data_st = StructType(
            [StructField(phys(f), f.dataType, f.nullable) for f in data_fields]
        )

        def logical(df: DataFrame) -> DataFrame:
            return df.select(
                *[F.col(phys(f)).alias(f.name) for f in data_fields]
            )

        if not part_cols:
            return logical(
                spark.read.schema(data_st).parquet(*[p for p, _ in snap.files])
            )
        part_fields = [f for f in snap.schema.fields if f.name in part_cols]
        groups: dict[tuple, list[str]] = {}
        for p, pv in snap.files:
            # partitionValues are keyed by PHYSICAL name in the log
            key = tuple(pv.get(phys(f)) for f in part_fields)
            groups.setdefault(key, []).append(p)
        out_cols = [f.name for f in snap.schema.fields]
        dfs = []
        for key, paths in sorted(
            groups.items(), key=lambda kv: tuple(str(k) for k in kv[0])
        ):
            g = logical(spark.read.schema(data_st).parquet(*paths))
            for f, v in zip(part_fields, key):
                if v is None:
                    g = g.withColumn(f.name, F.lit(None).cast(f.dataType))
                else:
                    g = g.withColumn(f.name, F.lit(v).cast(f.dataType))
            dfs.append(g.select(*out_cols))
        df = dfs[0]
        for g in dfs[1:]:
            df = df.unionByName(g)
        return df


class DeltaTableWriter:
    """Emit the Delta transaction-log protocol: create / append /
    overwrite commits plus classic parquet checkpoints. Commits are
    O_EXCL-atomic on the version file, the same optimistic-concurrency
    primitive the protocol specifies for a filesystem log store."""

    def __init__(self, path: str):
        self.path = path
        self._log = os.path.join(path, "_delta_log")

    # -- data-file staging --------------------------------------------------
    def _stage_files(
        self, df: DataFrame, partition_by: Sequence[str]
    ) -> list[dict]:
        """Write df as uniquely-named parquet files in Delta's layout
        (partition columns in Hive dirs and partitionValues, NOT in the
        file bytes) and return their add actions."""
        import glob
        import shutil

        stage = os.path.join(self.path, f"_stage_{uuid.uuid4().hex}")
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(stage)
        adds = []
        for src in sorted(
            glob.glob(os.path.join(stage, "**", "part-*.parquet"), recursive=True)
        ):
            rel_dir = os.path.relpath(os.path.dirname(src), stage)
            segs = rel_dir.split(os.sep) if rel_dir != "." else []
            partition_values = {}
            for seg in segs:
                k, _, v = seg.partition("=")
                partition_values[k] = (
                    None
                    if v == "__HIVE_DEFAULT_PARTITION__"
                    else urllib.parse.unquote(v)
                )
            name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            rel = "/".join([*segs, name])
            dst = os.path.join(self.path, *segs, name)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(src, dst)
            adds.append(
                {
                    "path": urllib.parse.quote(rel),
                    "partitionValues": partition_values,
                    "size": os.path.getsize(dst),
                    "modificationTime": int(os.path.getmtime(dst) * 1000),
                    "dataChange": True,
                }
            )
        shutil.rmtree(stage, ignore_errors=True)
        return adds

    def _commit(self, version: int, actions: list[dict]) -> None:
        os.makedirs(self._log, exist_ok=True)
        target = os.path.join(self._log, f"{version:020d}.json")
        payload = "".join(json.dumps(a) + "\n" for a in actions)
        fd = os.open(target, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        try:
            os.write(fd, payload.encode())
        finally:
            os.close(fd)

    def _meta_actions(
        self, schema: StructType, partition_by: Sequence[str]
    ) -> list[dict]:
        return [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(schema.jsonValue()),
                    "partitionColumns": list(partition_by),
                    "configuration": {},
                    "createdTime": 0,
                }
            },
        ]

    def create(
        self, df: DataFrame, partition_by: Sequence[str] = ()
    ) -> "DeltaTableReader":
        if os.path.isdir(self._log) and any(
            _COMMIT_RE.match(n) for n in os.listdir(self._log)
        ):
            raise FileExistsError(f"Delta table already exists: {self.path}")
        os.makedirs(self.path, exist_ok=True)
        adds = self._stage_files(df, partition_by)
        self._commit(
            0,
            self._meta_actions(df.schema, partition_by)
            + [{"add": a} for a in adds],
        )
        return DeltaTableReader(self.path)

    def append(self, df: DataFrame) -> int:
        r = DeltaTableReader(self.path)
        snap = r.snapshot()
        adds = self._stage_files(df, snap.partition_columns)
        v = snap.version + 1
        self._commit(v, [{"add": a} for a in adds])
        return v

    def overwrite_partition(self, df: DataFrame, **partition: str) -> int:
        """Replace one partition's files (remove actions for the old files,
        add actions for the new) — the classic Delta replaceWhere commit."""
        r = DeltaTableReader(self.path)
        snap = r.snapshot()
        removes = [
            {
                "remove": {
                    "path": urllib.parse.quote(os.path.relpath(p, self.path)),
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
            for p, pv in snap.files
            if all(pv.get(k) == str(v) for k, v in partition.items())
        ]
        adds = self._stage_files(df, snap.partition_columns)
        v = snap.version + 1
        self._commit(v, removes + [{"add": a} for a in adds])
        return v

    def checkpoint(self, version: int | None = None) -> str:
        """Write a classic single-file parquet checkpoint of the snapshot
        state (protocol + metaData + one add row per live file) and point
        ``_last_checkpoint`` at it, so replay cost stays O(actions since
        last checkpoint) — the protocol's answer to unbounded logs."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        r = DeltaTableReader(self.path)
        snap = r.snapshot(version)
        meta_row = {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(snap.schema.jsonValue()),
            "partitionColumns": list(snap.partition_columns),
            "configuration": dict(snap.configuration),
            "createdTime": 0,
        }
        rows = [
            {
                "protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
                "metaData": None,
                "add": None,
            },
            {"protocol": None, "metaData": meta_row, "add": None},
        ]
        for p, pv in snap.files:
            rows.append(
                {
                    "protocol": None,
                    "metaData": None,
                    "add": {
                        "path": urllib.parse.quote(
                            os.path.relpath(p, self.path)
                        ),
                        "partitionValues": list(pv.items()),
                        "size": os.path.getsize(p),
                        "modificationTime": 0,
                        "dataChange": False,
                    },
                }
            )
        # Explicit schema: partitionValues / options / configuration are
        # MAP<string,string> per the checkpoint spec — pyarrow inference
        # from dicts would produce per-row structs instead.
        smap = pa.map_(pa.string(), pa.string())
        schema = pa.schema(
            [
                pa.field(
                    "protocol",
                    pa.struct(
                        [
                            ("minReaderVersion", pa.int32()),
                            ("minWriterVersion", pa.int32()),
                        ]
                    ),
                ),
                pa.field(
                    "metaData",
                    pa.struct(
                        [
                            ("id", pa.string()),
                            (
                                "format",
                                pa.struct(
                                    [("provider", pa.string()), ("options", smap)]
                                ),
                            ),
                            ("schemaString", pa.string()),
                            ("partitionColumns", pa.list_(pa.string())),
                            ("configuration", smap),
                            ("createdTime", pa.int64()),
                        ]
                    ),
                ),
                pa.field(
                    "add",
                    pa.struct(
                        [
                            ("path", pa.string()),
                            ("partitionValues", smap),
                            ("size", pa.int64()),
                            ("modificationTime", pa.int64()),
                            ("dataChange", pa.bool_()),
                        ]
                    ),
                ),
            ]
        )
        for row in rows:
            meta = row["metaData"]
            if meta is not None:
                meta["format"]["options"] = list(meta["format"]["options"].items())
                meta["configuration"] = list(meta["configuration"].items())
        cp = os.path.join(self._log, f"{snap.version:020d}.checkpoint.parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), cp)
        with open(os.path.join(self._log, "_last_checkpoint"), "w") as f:
            json.dump({"version": snap.version, "size": len(rows)}, f)
        return cp

    def optimize(self, spark: SparkSession, target_files: int = 1) -> int:
        """OPTIMIZE (bin-packing compaction): rewrite the current
        snapshot's rows into ``target_files`` files and commit remove+add
        actions with ``dataChange: false`` — the protocol's marker that
        the commit reshuffles bytes without changing table content
        (streaming log readers skip it). Prior versions stay
        time-travelable until vacuum."""
        r = DeltaTableReader(self.path)
        snap = r.snapshot()
        df = r.to_df(spark)
        df = df.repartition(target_files) if target_files > 1 else df.coalesce(1)
        adds = self._stage_files(df, snap.partition_columns)
        for a in adds:
            a["dataChange"] = False
        removes = [
            {
                "remove": {
                    "path": urllib.parse.quote(
                        os.path.relpath(p, self.path)
                    ),
                    "deletionTimestamp": 0,
                    "dataChange": False,
                }
            }
            for p, _ in snap.files
        ]
        v = snap.version + 1
        self._commit(v, removes + [{"add": a} for a in adds])
        return v

    def vacuum(self) -> list[str]:
        """Physically delete data files under the table root that the
        CURRENT snapshot no longer references — Delta's VACUUM. Older
        versions whose files are collected stop being time-travelable
        (exactly the delta-spark trade; it gates on a retention window,
        here the caller decides when). The log is retained — reads still
        replay it, remove-actions already exclude the vacuumed files.
        Absolute (foreign) references from zero-copy exports are never
        touched."""
        import glob as g

        r = DeltaTableReader(self.path)
        snap = r.snapshot()
        live = {os.path.abspath(p) for p, _ in snap.files}
        removed = []
        for p in g.glob(
            os.path.join(self.path, "**", "*.parquet"), recursive=True
        ):
            ap = os.path.abspath(p)
            if os.sep + "_delta_log" + os.sep in ap:
                continue  # checkpoints are log structure, not data
            if ap not in live:
                os.remove(ap)
                removed.append(ap)
        return removed


def export_lake_snapshot(lake_table, dest_path: str, version: int | None = None):
    """ZERO-COPY export of a homegrown LakeTable snapshot as a real Delta
    table: writes a ``_delta_log`` at ``dest_path`` whose add actions
    reference the lake table's data files by absolute URI (the protocol
    explicitly allows absolute paths — the same mechanism SHALLOW CLONE
    uses). No data bytes move; any Delta reader pointed at ``dest_path``
    sees the snapshot. The lake layout matches Delta's (partition columns
    live in the manifest, not the file bytes), so partitioned tables
    export 1:1.

    Tables with live deletion vectors cannot export zero-copy (the DV
    sidecar format differs); compact() first to fold DVs away — enforced
    loudly here rather than exporting wrong rows."""
    snap = lake_table.snapshot(version)
    if any(f.get("dv") for f in snap.files):
        raise DeltaProtocolError(
            "snapshot has live deletion vectors; compact() to fold them "
            "before exporting"
        )
    schema = StructType.fromDDL(snap.schema)
    part_cols = list(snap.partition_by)
    w = DeltaTableWriter(dest_path)
    if os.path.isdir(w._log) and any(
        _COMMIT_RE.match(n) for n in os.listdir(w._log)
    ):
        raise FileExistsError(f"Delta table already exists: {dest_path}")
    os.makedirs(dest_path, exist_ok=True)
    adds = []
    for f in snap.files:
        abs_path = lake_table._abs(f["path"])
        pv = {
            c: (None if v == "__HIVE_DEFAULT_PARTITION__" else v)
            for c, v in (f.get("partition") or {}).items()
        }
        for c in part_cols:
            pv.setdefault(c, None)
        adds.append(
            {
                "path": "file://" + urllib.parse.quote(abs_path),
                "partitionValues": pv,
                "size": os.path.getsize(abs_path),
                "modificationTime": int(os.path.getmtime(abs_path) * 1000),
                "dataChange": True,
            }
        )
    w._commit(0, w._meta_actions(schema, part_cols) + [{"add": a} for a in adds])
    return DeltaTableReader(dest_path)


# ---------------------------------------------------------------------------
# Streaming source over the Delta log (the delta-spark streaming-read
# shape): every log version is one micro-batch; add actions with
# dataChange=true are emitted, dataChange=false commits (OPTIMIZE) are
# skipped silently — that marker exists exactly so streams don't re-emit
# compacted rows — and a dataChange remove (overwrite/delete) fails
# loudly, matching the real source's default for non-append changes.
# ---------------------------------------------------------------------------
try:  # the Python DataSource API needs pyspark >= 4; guard for importers
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )
except ImportError:  # pragma: no cover
    DataSource = DataSourceStreamReader = InputPartition = object  # type: ignore


class _DeltaFilePartition(InputPartition):
    def __init__(self, path: str, data_fields: list, part_consts: list,
                 out_order: list):
        #: data_fields: [(name, spark simpleString type)] for the file bytes
        #: part_consts: [(name, spark type, raw string value | None)]
        #: out_order: full column order of the DECLARED schema — Spark maps
        #: the Arrow batch to the schema POSITIONALLY
        self.path = path
        self.data_fields = data_fields
        self.part_consts = part_consts
        self.out_order = out_order


class DeltaCdfStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("delta_cdf requires a 'path' option")
        self.reader = DeltaTableReader(path)
        snap = self.reader.snapshot()
        if snap.configuration.get("delta.columnMapping.mode", "none") != "none":
            raise DeltaProtocolError(
                "delta_cdf streaming does not support column mapping"
            )
        self._snap = snap

    def initialOffset(self) -> dict:
        return {"version": -1}

    def latestOffset(self) -> dict:
        return {"version": self.reader.latest_version()}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        snap = self._snap
        part_cols = set(snap.partition_columns)
        data_fields = [
            (f.name, f.dataType.simpleString())
            for f in snap.schema.fields
            if f.name not in part_cols
        ]
        part_types = {
            f.name: f.dataType.simpleString()
            for f in snap.schema.fields
            if f.name in part_cols
        }
        parts = []
        for v in range(lo + 1, hi + 1):
            with open(
                os.path.join(self.reader._log, f"{v:020d}.json")
            ) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    action = json.loads(line)
                    if "add" in action and action["add"].get(
                        "dataChange", True
                    ):
                        a = action["add"]
                        consts = [
                            (c, part_types[c], a.get("partitionValues", {}).get(c))
                            for c in snap.partition_columns
                        ]
                        parts.append(
                            _DeltaFilePartition(
                                self.reader._abs_path(a["path"]),
                                data_fields,
                                consts,
                                [f.name for f in snap.schema.fields],
                            )
                        )
                    elif "remove" in action and action["remove"].get(
                        "dataChange", True
                    ):
                        raise ValueError(
                            f"delta_cdf is append-only: version {v} removes "
                            "data (overwrite/delete); re-read a fresh "
                            "snapshot instead"
                        )
        return parts

    def read(self, partition):
        # executors: stream the file's record batches, attaching the
        # partition columns as typed constants (Delta keeps them out of
        # the file bytes)
        import pyarrow as pa
        import pyarrow.parquet as pq

        _PA = {
            "bigint": pa.int64(), "int": pa.int32(), "double": pa.float64(),
            "float": pa.float32(), "boolean": pa.bool_(), "string": pa.string(),
        }

        def conv(t: str, raw):
            if raw is None:
                return None
            if t in ("bigint", "int"):
                return int(raw)
            if t in ("double", "float"):
                return float(raw)
            if t == "boolean":
                return raw == "true"
            return raw

        pf = pq.ParquetFile(partition.path)
        names = [n for n, _ in partition.data_fields]
        for batch in pf.iter_batches(columns=names):
            by_name = dict(zip(batch.schema.names, batch.columns))
            for c, t, raw in partition.part_consts:
                pa_t = _PA.get(t, pa.string())
                by_name[c] = pa.array(
                    [conv(t, raw)] * batch.num_rows, type=pa_t
                )
            # Spark maps the batch onto the declared schema POSITIONALLY:
            # emit columns in exactly that order
            yield pa.RecordBatch.from_arrays(
                [by_name[c] for c in partition.out_order],
                names=list(partition.out_order),
            )

    def commit(self, end: dict) -> None:
        pass  # the log is immutable; nothing to release

    def stop(self) -> None:
        pass


class DeltaCdfDataSource(DataSource):
    """``spark.readStream.format("delta_cdf").option("path", table_root)``
    after ``spark.dataSource.register(DeltaCdfDataSource)``."""

    @classmethod
    def name(cls):
        return "delta_cdf"

    def schema(self):
        return DeltaTableReader(self.options["path"]).snapshot().schema

    def streamReader(self, schema):
        return DeltaCdfStreamReader(self.options)


def register_delta_cdf_source(spark) -> None:
    spark.dataSource.register(DeltaCdfDataSource)
