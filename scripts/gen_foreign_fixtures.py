"""Generate COMMITTED golden fixtures that imitate FOREIGN writers.

VERDICT r7 item 2: the Delta/Iceberg compat readers were only ever proven
against their own writers (this sandbox has no network, no delta-spark,
no pyiceberg). This script hand-assembles byte-level table trees from the
PUBLIC protocol documents alone — Delta PROTOCOL.md and the Iceberg table
spec — sharing **no serialization code** with the readers under test:

- Delta commit JSONs are literal text in delta-spark's field order;
- deletion-vector ``.bin`` files are packed with raw ``struct`` calls
  straight from PROTOCOL.md § "Deletion Vector Format" (version byte,
  big-endian size + CRC framing, little-endian magic 1681511377, 64-bit
  roaring-bitmap-array portable body with cookie 12346) — NOT via
  aws_glue_data_lake_spark.roaring64;
- Iceberg Avro containers (manifest list + manifest) are written by a
  self-contained ~90-line Avro encoder below (zigzag varints, deflate
  codec, union branch indices) using the **Java writer's** record schemas
  (nullable unions, key/value map-as-array encodings, the `partitions`
  summary field) — NOT via aws_glue_data_lake_spark.avrolite;
- data files are plain pyarrow parquet (the same library every foreign
  writer links).

Everything is deterministic (fixed UUIDs, timestamps, sync markers), so
the OUTPUT BYTES are committed under tests/fixtures/foreign/ and the
tests read those committed bytes — regeneration is only needed when the
fixtures themselves change shape.

Run:  python scripts/gen_foreign_fixtures.py
"""

from __future__ import annotations

import io
import json
import os
import shutil
import struct
import zlib

import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                 "foreign")
)


# ===========================================================================
# Independent minimal Avro encoder (Avro 1.11 spec, binary encoding)
# ===========================================================================
def _zigzag(n: int) -> bytes:
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc(schema, value, out: bytearray, names: dict) -> None:
    if isinstance(schema, str) and schema in names:
        schema = names[schema]
    if isinstance(schema, list):  # union: branch index, then value
        for i, branch in enumerate(schema):
            bname = branch if isinstance(branch, str) else branch.get(
                "type", branch
            )
            if value is None and bname == "null":
                out += _zigzag(i)
                return
            if value is not None and bname != "null":
                out += _zigzag(i)
                _enc(branch, value, out, names)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return
    if t in ("long", "int"):
        out += _zigzag(int(value))
    elif t == "boolean":
        out.append(1 if value else 0)
    elif t == "string":
        b = value.encode()
        out += _zigzag(len(b)) + b
    elif t == "bytes":
        out += _zigzag(len(value)) + bytes(value)
    elif t == "record":
        names[schema["name"]] = schema
        for f in schema["fields"]:
            _enc(f["type"], value[f["name"]], out, names)
    elif t == "array":
        items = list(value)
        if items:
            out += _zigzag(len(items))
            for it in items:
                _enc(schema["items"], it, out, names)
        out += _zigzag(0)
    elif t == "map":
        pairs = list(value.items())
        if pairs:
            out += _zigzag(len(pairs))
            for k, v in pairs:
                kb = k.encode()
                out += _zigzag(len(kb)) + kb
                _enc(schema["values"], v, out, names)
        out += _zigzag(0)
    else:
        raise ValueError(f"unsupported avro type {t!r}")


def write_avro(path: str, schema: dict, records: list, sync: bytes,
               codec: str = "deflate") -> None:
    """Avro object container file: magic, metadata map, sync, one block."""
    body = bytearray()
    for r in records:
        _enc(schema, r, body, {})
    if codec == "deflate":
        block = zlib.compress(bytes(body))[2:-4]
    else:
        block = bytes(body)
    meta = {"avro.schema": json.dumps(schema).encode(),
            "avro.codec": codec.encode()}
    buf = io.BytesIO()
    buf.write(b"Obj\x01")
    out = bytearray()
    out += _zigzag(len(meta))
    for k, v in meta.items():
        kb = k.encode()
        out += _zigzag(len(kb)) + kb
        out += _zigzag(len(v)) + v
    out += _zigzag(0)
    buf.write(bytes(out))
    buf.write(sync)
    buf.write(_zigzag(len(records)))
    buf.write(_zigzag(len(block)))
    buf.write(block)
    buf.write(sync)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


# ===========================================================================
# Hand-packed Delta deletion vector (PROTOCOL.md § Deletion Vector Format)
# ===========================================================================
def pack_dv_bin(positions_per_dv: list[list[int]]) -> tuple[bytes, list]:
    """DV file bytes + [(offset, sizeInBytes)] per stored DV. Format:
    1-byte version (1); per DV: int32 BE size, data, int32 BE CRC-32 of
    data. data = uint32 LE magic 1681511377 + RoaringBitmapArray portable:
    uint64 LE bitmap count, then per 32-bit bitmap the standard roaring
    portable serialization (cookie 12346 = no run containers: uint32 LE
    cookie, uint32 LE container count, per container uint16 LE key +
    uint16 LE cardinality-1, uint32 LE offsets, then array containers as
    uint16 LE values)."""
    out = bytearray(b"\x01")
    spans = []
    for positions in positions_per_dv:
        by_high: dict[int, list[int]] = {}
        for p in sorted(set(positions)):
            by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
        n_bitmaps = max(by_high) + 1 if by_high else 0
        body = bytearray(struct.pack("<I", 1681511377))
        body += struct.pack("<Q", n_bitmaps)
        for hi in range(n_bitmaps):
            vals32 = by_high.get(hi, [])
            by_key: dict[int, list[int]] = {}
            for v in vals32:
                by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
            keys = sorted(by_key)
            bm = bytearray(struct.pack("<II", 12346, len(keys)))
            for k in keys:
                bm += struct.pack("<HH", k, len(by_key[k]) - 1)
            # offsets: from start of this bitmap's serialization
            off = 4 + 4 + 4 * len(keys) + 4 * len(keys)
            for k in keys:
                bm += struct.pack("<I", off)
                off += 2 * len(by_key[k])
            for k in keys:
                for v in by_key[k]:
                    bm += struct.pack("<H", v)
            body += bm
        offset = len(out)
        out += struct.pack(">i", len(body))
        out += body
        out += struct.pack(">I", zlib.crc32(bytes(body)) & 0xFFFFFFFF)
        spans.append((offset, len(body)))
    return bytes(out), spans


_Z85 = ("0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#")


def z85(data: bytes) -> str:
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i:i + 4])
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85[r])
        out.extend(reversed(chunk))
    return "".join(out)


# ===========================================================================
# Fixture 1: Delta table (partitioned, 3 commits, DV tombstones)
# ===========================================================================
def gen_delta(root: str) -> None:
    path = os.path.join(root, "delta_golden")
    shutil.rmtree(path, ignore_errors=True)
    log = os.path.join(path, "_delta_log")
    os.makedirs(os.path.join(path, "part=a"))
    os.makedirs(os.path.join(path, "part=b"))
    os.makedirs(log)

    def write_data(rel: str, ks: list[int], vs: list[int]) -> int:
        p = os.path.join(path, rel)
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array(vs, pa.int64())}), p)
        return os.path.getsize(p)

    s0 = write_data("part=a/f0.parquet", [1, 2, 3], [10, 20, 30])
    s1 = write_data("part=b/f1.parquet", [4, 5], [40, 50])
    s2 = write_data("part=b/f2.parquet", [6, 7], [60, 70])

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            {"name": "part", "type": "string", "nullable": True,
             "metadata": {}},
        ],
    })
    # v0: create with two files (delta-spark commitInfo/field order)
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 1700000000000, "operation": "WRITE",
            "operationParameters": {"mode": "ErrorIfExists",
                                    "partitionBy": '["part"]'},
            "engineInfo": "Apache-Spark/3.5.1 Delta-Lake/3.2.0",
        }}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 2}}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "11111111-2222-3333-4444-555555555555",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": ["part"],
            "configuration": {},
            "createdTime": 1700000000000,
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "part=a/f0.parquet", "partitionValues": {"part": "a"},
            "size": s0, "modificationTime": 1700000000000,
            "dataChange": True,
            "stats": json.dumps({"numRecords": 3,
                                 "minValues": {"k": 1, "v": 10},
                                 "maxValues": {"k": 3, "v": 30},
                                 "nullCount": {"k": 0, "v": 0}}),
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "part=b/f1.parquet", "partitionValues": {"part": "b"},
            "size": s1, "modificationTime": 1700000000000,
            "dataChange": True,
            "stats": json.dumps({"numRecords": 2,
                                 "minValues": {"k": 4, "v": 40},
                                 "maxValues": {"k": 5, "v": 50},
                                 "nullCount": {"k": 0, "v": 0}}),
        }}) + "\n")
    # v1: replace partition b's file (remove + add, an overwrite)
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 1700000001000, "operation": "WRITE",
            "operationParameters": {"mode": "Overwrite",
                                    "predicate": "part = 'b'"},
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "part=b/f2.parquet", "partitionValues": {"part": "b"},
            "size": s2, "modificationTime": 1700000001000,
            "dataChange": True,
        }}) + "\n")
        f.write(json.dumps({"remove": {
            "path": "part=b/f1.parquet", "deletionTimestamp": 1700000001000,
            "dataChange": True, "extendedFileMetadata": True,
            "partitionValues": {"part": "b"}, "size": s1,
        }}) + "\n")
    # v2: DELETE k=2 via a deletion vector on f0 (protocol upgrade to
    # reader-feature deletionVectors; DV bin hand-packed above)
    dv_bytes, spans = pack_dv_bin([[1]])  # row position 1 == k=2
    dv_uuid_bytes = bytes(range(16))
    dv_name = "deletion_vector_" + \
        "00010203-0405-0607-0809-0a0b0c0d0e0f" + ".bin"
    with open(os.path.join(path, dv_name), "wb") as f:
        f.write(dv_bytes)
    off, size = spans[0]
    with open(os.path.join(log, f"{2:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 1700000002000, "operation": "DELETE",
            "operationParameters": {"predicate": '["k = 2"]'},
        }}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"],
        }}) + "\n")
        f.write(json.dumps({"remove": {
            "path": "part=a/f0.parquet",
            "deletionTimestamp": 1700000002000, "dataChange": True,
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "part=a/f0.parquet",
            "partitionValues": {"part": "a"}, "size": s0,
            "modificationTime": 1700000000000, "dataChange": True,
            "stats": json.dumps({"numRecords": 3,
                                 "minValues": {"k": 1, "v": 10},
                                 "maxValues": {"k": 3, "v": 30},
                                 "nullCount": {"k": 0, "v": 0}}),
            "deletionVector": {
                "storageType": "u",
                "pathOrInlineDv": z85(dv_uuid_bytes),
                "offset": off, "sizeInBytes": size, "cardinality": 1,
            },
        }}) + "\n")
    print(f"delta_golden: {path}")


# ===========================================================================
# Fixture 2: Iceberg v2 table (Java Avro schemas, deflate, MoR deletes)
# ===========================================================================
#: Java iceberg-core manifest-list schema (nullable unions + the
#: `partitions` field summary our reader must skip over)
ML_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int",
         "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
        {"name": "partitions", "type": ["null", {
            "type": "array", "items": {
                "type": "record", "name": "r508", "fields": [
                    {"name": "contains_null", "type": "boolean",
                     "field-id": 509},
                    {"name": "contains_nan", "type": ["null", "boolean"],
                     "field-id": 518},
                    {"name": "lower_bound", "type": ["null", "bytes"],
                     "field-id": 510},
                    {"name": "upper_bound", "type": ["null", "bytes"],
                     "field-id": 511},
                ],
            },
        }], "default": None, "field-id": 508},
    ],
}


def manifest_schema(part_fields: list[dict]) -> dict:
    """Java iceberg-core manifest-entry schema: nullable unions, bounds as
    array<record{key,value}> with logicalType map."""
    def kvmap(name, ktype, vtype):
        return ["null", {
            "type": "array", "logicalType": "map", "items": {
                "type": "record", "name": name, "fields": [
                    {"name": "key", "type": ktype},
                    {"name": "value", "type": vtype},
                ],
            },
        }]

    return {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            {"name": "snapshot_id", "type": ["null", "long"],
             "default": None, "field-id": 1},
            {"name": "sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 3},
            {"name": "file_sequence_number", "type": ["null", "long"],
             "default": None, "field-id": 4},
            {"name": "data_file", "type": {
                "type": "record", "name": "r2", "fields": [
                    {"name": "content", "type": "int", "field-id": 134},
                    {"name": "file_path", "type": "string",
                     "field-id": 100},
                    {"name": "file_format", "type": "string",
                     "field-id": 101},
                    {"name": "partition", "type": {
                        "type": "record", "name": "r102",
                        "fields": part_fields,
                    }, "field-id": 102},
                    {"name": "record_count", "type": "long",
                     "field-id": 103},
                    {"name": "file_size_in_bytes", "type": "long",
                     "field-id": 104},
                    {"name": "value_counts",
                     "type": kvmap("k119_v120", "int", "long"),
                     "default": None, "field-id": 109},
                    {"name": "null_value_counts",
                     "type": kvmap("k121_v122", "int", "long"),
                     "default": None, "field-id": 110},
                    {"name": "lower_bounds",
                     "type": kvmap("k126_v127", "int", "bytes"),
                     "default": None, "field-id": 125},
                    {"name": "upper_bounds",
                     "type": kvmap("k129_v130", "int", "bytes"),
                     "default": None, "field-id": 128},
                    {"name": "split_offsets",
                     "type": ["null", {"type": "array", "items": "long"}],
                     "default": None, "field-id": 132},
                    {"name": "equality_ids",
                     "type": ["null", {"type": "array", "items": "int"}],
                     "default": None, "field-id": 135},
                    {"name": "sort_order_id", "type": ["null", "int"],
                     "default": None, "field-id": 140},
                ],
            }, "field-id": 2},
        ],
    }


def gen_iceberg(root: str) -> None:
    path = os.path.join(root, "iceberg_golden")
    shutil.rmtree(path, ignore_errors=True)
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(meta_dir)
    os.makedirs(data_dir)
    sync = bytes(range(16))

    def data_file(name, ks, vs, part):
        p = os.path.join(data_dir, name)
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array(vs, pa.int64()),
                      "part": pa.array([part] * len(ks), pa.string())}), p)
        # Java writers reference files by absolute URI
        return "file://" + p

    def le64(n):  # Iceberg single-value serialization: little-endian longs
        return struct.pack("<q", n)

    f_a = data_file("a.parquet", [1, 2, 3], [10, 20, 30], "a")
    f_b = data_file("b.parquet", [4, 5], [40, 50], "b")
    part_fields = [{"name": "part", "type": ["null", "string"],
                    "default": None, "field-id": 1000}]

    def entry(fp, n, part, *, status=1, seq=None, content=0,
              eq_ids=None, bounds=None):
        d = {
            "status": status, "snapshot_id": 3001, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": content, "file_path": fp,
                "file_format": "PARQUET", "partition": {"part": part},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(
                    fp.removeprefix("file://")),
                "value_counts": None, "null_value_counts": None,
                "lower_bounds": None, "upper_bounds": None,
                "split_offsets": [4], "equality_ids": eq_ids,
                "sort_order_id": 0 if content == 0 else None,
            },
        }
        if bounds:
            lo, hi = bounds
            d["data_file"]["lower_bounds"] = [
                {"key": k, "value": le64(v)} for k, v in lo.items()]
            d["data_file"]["upper_bounds"] = [
                {"key": k, "value": le64(v)} for k, v in hi.items()]
            d["data_file"]["value_counts"] = [
                {"key": 1, "value": n}, {"key": 2, "value": n}]
            d["data_file"]["null_value_counts"] = [
                {"key": 1, "value": 0}, {"key": 2, "value": 0}]
        return d

    # manifest 1 (snapshot 3001, seq 1): both data files; entry seq is
    # NULL -> inherited from the manifest-list entry (spec inheritance)
    m1 = os.path.join(meta_dir, "m1-data.avro")
    write_avro(m1, manifest_schema(part_fields), [
        entry(f_a, 3, "a", bounds=({1: 1, 2: 10}, {1: 3, 2: 30})),
        entry(f_b, 2, "b", bounds=({1: 4, 2: 40}, {1: 5, 2: 50})),
    ], sync)

    # position-delete file (snapshot 3002, seq 2): kills a.parquet row 1
    # (k=2). Java writes file_path/pos columns (field ids 2147483546/5).
    pd_local = os.path.join(data_dir, "pos-del.parquet")
    pq.write_table(pa.table({
        "file_path": pa.array([f_a], pa.string()),
        "pos": pa.array([1], pa.int64()),
    }), pd_local)
    pd = "file://" + pd_local
    m2 = os.path.join(meta_dir, "m2-posdel.avro")
    write_avro(m2, manifest_schema(part_fields), [
        entry(pd, 1, None, seq=2, content=1),
    ], sync)

    # equality-delete file (snapshot 3003, seq 3): kills k=4 in all data
    # with seq < 3 (i.e. b.parquet's copy)
    ed_local = os.path.join(data_dir, "eq-del.parquet")
    pq.write_table(pa.table({"k": pa.array([4], pa.int64())}), ed_local)
    ed = "file://" + ed_local
    m3 = os.path.join(meta_dir, "m3-eqdel.avro")
    write_avro(m3, manifest_schema(part_fields), [
        entry(ed, 1, None, seq=3, content=2, eq_ids=[1]),
    ], sync)

    def ml_entry(mp, *, content, seq, min_seq, added_files, added_rows):
        return {
            "manifest_path": "file://" + mp,
            "manifest_length": os.path.getsize(mp),
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": min_seq,
            "added_snapshot_id": 3000 + seq,
            "added_data_files_count": added_files,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": added_rows,
            "existing_rows_count": 0, "deleted_rows_count": 0,
            "partitions": [{"contains_null": False, "contains_nan": False,
                            "lower_bound": b"a", "upper_bound": b"b"}],
        }

    mls = []
    for sid, manifests in (
        (3001, [ml_entry(m1, content=0, seq=1, min_seq=1,
                         added_files=2, added_rows=5)]),
        (3002, [ml_entry(m1, content=0, seq=1, min_seq=1,
                         added_files=2, added_rows=5),
                ml_entry(m2, content=1, seq=2, min_seq=2,
                         added_files=1, added_rows=1)]),
        (3003, [ml_entry(m1, content=0, seq=1, min_seq=1,
                         added_files=2, added_rows=5),
                ml_entry(m2, content=1, seq=2, min_seq=2,
                         added_files=1, added_rows=1),
                ml_entry(m3, content=1, seq=3, min_seq=3,
                         added_files=1, added_rows=1)]),
    ):
        mlp = os.path.join(meta_dir, f"snap-{sid}.avro")
        write_avro(mlp, ML_SCHEMA, manifests, sync)
        mls.append((sid, "file://" + mlp))

    meta = {
        "format-version": 2,
        "table-uuid": "99999999-8888-7777-6666-555555555555",
        "location": path,
        "last-sequence-number": 3,
        "last-updated-ms": 1700000003000,
        "last-column-id": 3,
        "current-schema-id": 0,
        "schemas": [{
            "type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "v", "required": False, "type": "long"},
                {"id": 3, "name": "part", "required": False,
                 "type": "string"},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": [
            {"name": "part", "transform": "identity", "source-id": 3,
             "field-id": 1000},
        ]}],
        "last-partition-id": 1000,
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {"write.parquet.compression-codec": "zstd"},
        "current-snapshot-id": 3003,
        "snapshots": [
            {"snapshot-id": sid, "sequence-number": seq,
             "timestamp-ms": 1700000000000 + seq * 1000,
             "manifest-list": mlp, "schema-id": 0,
             "summary": {"operation": op}}
            for (sid, mlp), (seq, op) in zip(
                mls, [(1, "append"), (2, "delete"), (3, "delete")])
        ],
        "snapshot-log": [
            {"snapshot-id": sid, "timestamp-ms": 1700000000000 + i * 1000}
            for i, (sid, _) in enumerate(mls, start=1)
        ],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": 3003, "type": "branch"}},
    }
    with open(os.path.join(meta_dir, "v3.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("3")
    print(f"iceberg_golden: {path}")




# ===========================================================================
# Fixture 3: Iceberg format-version 3 (field IDs, rename, puffin DV)
# ===========================================================================
def gen_iceberg_v3(root: str) -> None:
    """v3 golden tree exercising every round-8 read path at once: parquet
    files stamped with FIELD IDS whose physical column name predates a
    rename (only ID resolution reads them), plus a puffin deletion vector
    located by the manifest's content_offset (framing hand-packed above,
    same bytes as Delta's)."""
    path = os.path.join(root, "iceberg_v3_golden")
    shutil.rmtree(path, ignore_errors=True)
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(meta_dir)
    os.makedirs(data_dir)
    sync = bytes(range(16))

    def idfield(name, typ, fid):
        return pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    # data written BEFORE the rename: physical column 'amount_old', id 2
    fp = os.path.join(data_dir, "pre-rename.parquet")
    pq.write_table(
        pa.table(
            [pa.array([1, 2, 3, 4], pa.int64()),
             pa.array([100, 200, 300, 400], pa.int64())],
            schema=pa.schema([idfield("k", pa.int64(), 1),
                              idfield("amount_old", pa.int64(), 2)]),
        ),
        fp,
    )
    fp_uri = "file://" + fp
    # puffin DV killing row positions 0 and 2 (k=1, k=3)
    dv_body, spans = pack_dv_bin([[0, 2]])
    # pack_dv_bin frames with a leading version byte (Delta file layout);
    # a puffin file instead starts with its own magic — reuse the framed
    # blob bytes (after the version byte) at offset 4
    framed = dv_body[1:]
    puf = os.path.join(data_dir, "dv.puffin")
    with open(puf, "wb") as f:
        f.write(b"PFA1" + framed + b"PFA1")
    # content_size_in_bytes counts the TOTAL stored blob (length word +
    # data + CRC) per the Puffin footer, not just the inner data length
    off, size = 4, spans[0][1] + 8

    entry_schema = manifest_schema([])
    entry_schema["fields"][-1]["type"]["fields"] += [
        {"name": "referenced_data_file", "type": ["null", "string"],
         "default": None, "field-id": 143},
        {"name": "content_offset", "type": ["null", "long"],
         "default": None, "field-id": 144},
        {"name": "content_size_in_bytes", "type": ["null", "long"],
         "default": None, "field-id": 145},
    ]

    def entry(fpath, n, *, seq, content=0, dv=None):
        d = {
            "status": 1, "snapshot_id": 7000 + seq,
            "sequence_number": seq, "file_sequence_number": seq,
            "data_file": {
                "content": content, "file_path": fpath,
                "file_format": "PUFFIN" if dv else "PARQUET",
                "partition": {}, "record_count": n,
                "file_size_in_bytes": os.path.getsize(
                    fpath.removeprefix("file://")),
                "value_counts": None, "null_value_counts": None,
                "lower_bounds": None, "upper_bounds": None,
                "split_offsets": None, "equality_ids": None,
                "sort_order_id": None,
                "referenced_data_file": dv[0] if dv else None,
                "content_offset": dv[1] if dv else None,
                "content_size_in_bytes": dv[2] if dv else None,
            },
        }
        return d

    m1 = os.path.join(meta_dir, "m1-data.avro")
    write_avro(m1, entry_schema, [entry(fp_uri, 4, seq=1)], sync)
    m2 = os.path.join(meta_dir, "m2-dv.avro")
    write_avro(
        m2, entry_schema,
        [entry("file://" + puf, 2, seq=2, content=1,
               dv=(fp_uri, off, size))],
        sync,
    )

    def ml_entry(mp, *, content, seq):
        return {
            "manifest_path": "file://" + mp,
            "manifest_length": os.path.getsize(mp),
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": 7000 + seq,
            "added_data_files_count": 1,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": 4 if content == 0 else 2,
            "existing_rows_count": 0, "deleted_rows_count": 0,
            "partitions": None,
        }

    ml1 = os.path.join(meta_dir, "snap-7001.avro")
    write_avro(ml1, ML_SCHEMA, [ml_entry(m1, content=0, seq=1)], sync)
    ml2 = os.path.join(meta_dir, "snap-7002.avro")
    write_avro(
        ml2, ML_SCHEMA,
        [ml_entry(m1, content=0, seq=1), ml_entry(m2, content=1, seq=2)],
        sync,
    )
    meta = {
        "format-version": 3,
        "table-uuid": "33333333-4444-5555-6666-777777777777",
        "location": path,
        "last-sequence-number": 2,
        "last-updated-ms": 1700000002000,
        "last-column-id": 3,
        "next-row-id": 10,
        "current-schema-id": 1,
        "schemas": [{
            # post-rename schema: field 2 is now 'amount'; field 3 was
            # added AFTER the data file was written with a v3
            # initial-default — readers must substitute 9 (not null)
            # for files that lack the column
            "type": "struct", "schema-id": 1, "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "amount", "required": False,
                 "type": "long"},
                {"id": 3, "name": "flag", "required": False,
                 "type": "long", "initial-default": 9,
                 "write-default": 9},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 7002,
        "snapshots": [
            {"snapshot-id": 7001, "sequence-number": 1,
             "timestamp-ms": 1700000001000, "manifest-list":
             "file://" + ml1, "schema-id": 1,
             "summary": {"operation": "append"}},
            {"snapshot-id": 7002, "sequence-number": 2,
             "timestamp-ms": 1700000002000, "manifest-list":
             "file://" + ml2, "schema-id": 1,
             "summary": {"operation": "delete"}},
        ],
        "snapshot-log": [
            {"snapshot-id": 7001, "timestamp-ms": 1700000001000},
            {"snapshot-id": 7002, "timestamp-ms": 1700000002000},
        ],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": 7002, "type": "branch"}},
    }
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")
    print(f"iceberg_v3_golden: {path}")


# ===========================================================================
# Fixture 4: Iceberg mixed data formats (parquet + ORC + Avro) with
# position deletes over the non-parquet rows
# ===========================================================================
def gen_iceberg_mixed(root: str) -> None:
    """Unpartitioned v2 table whose three data files use the spec's
    three data formats — parquet (pyarrow), ORC (pyarrow.orc) and an
    Avro container encoded by THIS script's own encoder (independent of
    the engine's avrolite) — plus a position-delete file tombstoning one
    ORC row and one Avro row (position = record order, spec § Position
    Delete Files)."""
    import pyarrow.orc as _orc

    path = os.path.join(root, "iceberg_mixed_golden")
    shutil.rmtree(path, ignore_errors=True)
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(meta_dir)
    os.makedirs(data_dir)
    sync = bytes(range(16))

    f_pq = os.path.join(data_dir, "a.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "v": pa.array([10, 20], pa.int64())}), f_pq)
    f_orc = os.path.join(data_dir, "b.orc")
    _orc.write_table(
        pa.table({"k": pa.array([3, 4], pa.int64()),
                  "v": pa.array([30, 40], pa.int64())}), f_orc)
    f_av = os.path.join(data_dir, "c.avro")
    write_avro(
        f_av,
        {"type": "record", "name": "r", "fields": [
            {"name": "k", "type": ["null", "long"], "default": None},
            {"name": "v", "type": ["null", "long"], "default": None},
        ]},
        [{"k": 5, "v": 50}, {"k": 6, "v": 60}],
        sync,
    )
    # position delete: ORC row 0 (k=3) and Avro row 1 (k=6)
    f_pd = os.path.join(data_dir, "pos-del.parquet")
    pq.write_table(pa.table({
        "file_path": pa.array(
            ["file://" + f_orc, "file://" + f_av], pa.string()),
        "pos": pa.array([0, 1], pa.int64()),
    }), f_pd)

    def entry(fp, n, fmt, *, seq, content=0):
        return {
            "status": 1, "snapshot_id": 8000 + seq,
            "sequence_number": seq, "file_sequence_number": seq,
            "data_file": {
                "content": content, "file_path": "file://" + fp,
                "file_format": fmt, "partition": {},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(fp),
                "value_counts": None, "null_value_counts": None,
                "lower_bounds": None, "upper_bounds": None,
                "split_offsets": None, "equality_ids": None,
                "sort_order_id": None,
            },
        }

    msch = manifest_schema([])
    m1 = os.path.join(meta_dir, "m1-data.avro")
    write_avro(m1, msch, [
        entry(f_pq, 2, "PARQUET", seq=1),
        entry(f_orc, 2, "ORC", seq=1),
        entry(f_av, 2, "AVRO", seq=1),
    ], sync)
    m2 = os.path.join(meta_dir, "m2-posdel.avro")
    write_avro(m2, msch, [entry(f_pd, 2, "PARQUET", seq=2, content=1)], sync)

    def ml_entry(mp, *, content, seq):
        return {
            "manifest_path": "file://" + mp,
            "manifest_length": os.path.getsize(mp),
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": 8000 + seq,
            "added_data_files_count": 3 if content == 0 else 1,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": 6 if content == 0 else 2,
            "existing_rows_count": 0, "deleted_rows_count": 0,
            "partitions": [],
        }

    ml1 = os.path.join(meta_dir, "snap-8001.avro")
    write_avro(ml1, ML_SCHEMA, [ml_entry(m1, content=0, seq=1)], sync)
    ml2 = os.path.join(meta_dir, "snap-8002.avro")
    write_avro(ml2, ML_SCHEMA, [
        ml_entry(m1, content=0, seq=1),
        ml_entry(m2, content=1, seq=2),
    ], sync)
    meta = {
        "format-version": 2,
        "table-uuid": "aaaa1111-2222-3333-4444-555566667777",
        "location": path,
        "last-sequence-number": 2,
        "last-updated-ms": 1700000002000,
        "last-column-id": 2,
        "current-schema-id": 0,
        "schemas": [{
            "type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "v", "required": False, "type": "long"},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 8002,
        "snapshots": [
            {"snapshot-id": 8001, "sequence-number": 1,
             "timestamp-ms": 1700000001000,
             "manifest-list": "file://" + ml1, "schema-id": 0,
             "summary": {"operation": "append"}},
            {"snapshot-id": 8002, "sequence-number": 2,
             "timestamp-ms": 1700000002000,
             "manifest-list": "file://" + ml2, "schema-id": 0,
             "summary": {"operation": "delete"}},
        ],
        "snapshot-log": [
            {"snapshot-id": 8001, "timestamp-ms": 1700000001000},
            {"snapshot-id": 8002, "timestamp-ms": 1700000002000},
        ],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": 8002, "type": "branch"}},
    }
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")
    print(f"iceberg_mixed_golden: {path}")


def gen_delta_variant(root: str) -> None:
    """A foreign Delta table the way a Spark-4-era Databricks runtime
    stamps it: reader-v3 with readerFeatures
    [vacuumProtocolCheck, variantType] — both scan-inert for a reader
    that pins the table schema — and a VARIANT column whose parquet
    bytes are hand-packed per parquet-format VariantEncoding.md (the
    unshredded struct<metadata binary, value binary> physical pair;
    Spark's vectorized reader accepts the group without the VARIANT
    logical-type annotation when the read schema pins VariantType).
    A reader that hard-fails unknown-but-inert features refuses this
    perfectly readable table; a reader that mis-decodes the variant
    bytes returns wrong variant_get() values. Rows: k=1..4, payload
    {"a": k, "tag": "even"|"odd"}."""
    path = os.path.join(root, "delta_variant_golden")
    shutil.rmtree(path, ignore_errors=True)
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)

    # -- variant binary encoding (VariantEncoding.md), dict keys a,tag --
    def vmeta(keys: list[str]) -> bytes:
        # header 0x01: version 1, sorted dictionary, 1-byte offsets
        out = bytearray([0x01, len(keys)])
        offs, acc = [0], 0
        for k in keys:
            acc += len(k)
            offs.append(acc)
        out += bytes(offs)
        for k in keys:
            out += k.encode()
        return bytes(out)

    def vstr(s: str) -> bytes:
        # short string: basic_type=1, header=len
        return bytes([(len(s) << 2) | 1]) + s.encode()

    def vint8(n: int) -> bytes:
        return bytes([0x0C, n & 0xFF])  # primitive(0), type_id 3 = int8

    def vobj(fields: list[tuple[int, bytes]]) -> bytes:
        # object: basic_type=2; small form, 1-byte ids & offsets
        out = bytearray([0x02, len(fields)])
        out += bytes(fid for fid, _ in fields)
        offs, acc = [], 0
        for _, val in fields:
            offs.append(acc)
            acc += len(val)
        out += bytes(offs + [acc])
        for _, val in fields:
            out += val
        return bytes(out)

    meta_bytes = vmeta(["a", "tag"])
    rows = []
    for k in (1, 2, 3, 4):
        tag = "even" if k % 2 == 0 else "odd"
        rows.append(
            {
                "metadata": meta_bytes,
                "value": vobj([(0, vint8(k)), (1, vstr(tag))]),
            }
        )
    t = pa.table(
        {
            "k": pa.array([1, 2, 3, 4], pa.int64()),
            "payload": pa.array(
                rows,
                pa.struct(
                    [("metadata", pa.binary()), ("value", pa.binary())]
                ),
            ),
        }
    )
    fp = os.path.join(path, "f0.parquet")
    pq.write_table(t, fp)
    s0 = os.path.getsize(fp)

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "payload", "type": "variant", "nullable": True,
             "metadata": {}},
        ],
    })
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 1700000010000, "operation": "WRITE",
            "operationParameters": {"mode": "ErrorIfExists",
                                    "partitionBy": "[]"},
            "engineInfo": "Apache-Spark/4.0.0 Delta-Lake/4.0.0",
        }}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["vacuumProtocolCheck", "variantType"],
            "writerFeatures": ["vacuumProtocolCheck", "variantType",
                               "appendOnly", "invariants"],
        }}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "99999999-8888-7777-6666-555544443333",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {},
            "createdTime": 1700000010000,
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {},
            "size": s0, "modificationTime": 1700000010000,
            "dataChange": True,
            "stats": json.dumps({"numRecords": 4,
                                 "minValues": {"k": 1},
                                 "maxValues": {"k": 4},
                                 "nullCount": {"k": 0}}),
        }}) + "\n")
    print(f"delta_variant_golden: {path}")


def gen_delta_variant_shredded(root: str) -> None:
    """The SHREDDED twin of delta_variant_golden, hand-packed per
    parquet-format VariantShredding.md: the variant group carries a
    ``typed_value`` subtree next to the (metadata, value) pair, and the
    reader must REASSEMBLE — shredded subcolumns merge with the
    residual ``value`` object and per-field residuals. Spec rule worth
    pinning: when the shredding schema is an OBJECT, every object
    value shreds (fields in the schema must never appear in the
    residual ``value`` — Spark's pushed variant_get relies on it);
    only non-object values land whole in ``value``. Rows cover every
    conforming reassembly path:
      k=1 fully shredded              -> {"a":1,"tag":"odd"}
      k=2 shredded + residual b=7     -> {"a":2,"b":7,"tag":"even"}
      k=3 shredded, field a ABSENT    -> {"tag":"only"}
      k=4 non-object (scalar) value   -> 5
      k=5 field-level type-mismatch
          residual (a is a string)    -> {"a":"str-a"}
    """
    path = os.path.join(root, "delta_variant_shredded_golden")
    shutil.rmtree(path, ignore_errors=True)
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)

    def vmeta(keys: list[str]) -> bytes:
        out = bytearray([0x01, len(keys)])
        offs, acc = [0], 0
        for k in keys:
            acc += len(k)
            offs.append(acc)
        out += bytes(offs)
        for k in keys:
            out += k.encode()
        return bytes(out)

    def vstr(s: str) -> bytes:
        return bytes([(len(s) << 2) | 1]) + s.encode()

    def vint8(n: int) -> bytes:
        return bytes([0x0C, n & 0xFF])

    def vobj(fields: list[tuple[int, bytes]]) -> bytes:
        out = bytearray([0x02, len(fields)])
        out += bytes(fid for fid, _ in fields)
        offs, acc = [], 0
        for _, val in fields:
            offs.append(acc)
            acc += len(val)
        out += bytes(offs + [acc])
        for _, val in fields:
            out += val
        return bytes(out)

    meta = vmeta(["a", "b", "tag"])  # sorted dict: a=0, b=1, tag=2
    rows = [
        {"metadata": meta, "value": None,
         "typed_value": {"a": {"typed_value": 1, "value": None},
                         "tag": {"typed_value": "odd", "value": None}}},
        {"metadata": meta, "value": vobj([(1, vint8(7))]),
         "typed_value": {"a": {"typed_value": 2, "value": None},
                         "tag": {"typed_value": "even",
                                 "value": None}}},
        {"metadata": meta, "value": None,
         "typed_value": {"a": {"typed_value": None, "value": None},
                         "tag": {"typed_value": "only",
                                 "value": None}}},
        {"metadata": meta, "value": vint8(5), "typed_value": None},
        {"metadata": meta, "value": None,
         "typed_value": {"a": {"typed_value": None,
                               "value": vstr("str-a")},
                         "tag": {"typed_value": None, "value": None}}},
    ]

    def field_t(t):
        return pa.struct([("typed_value", t), ("value", pa.binary())])

    payload_t = pa.struct([
        ("metadata", pa.binary()),
        ("value", pa.binary()),
        ("typed_value", pa.struct([
            ("a", field_t(pa.int64())),
            ("tag", field_t(pa.string())),
        ])),
    ])
    t = pa.table({
        "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "payload": pa.array(rows, payload_t),
    })
    fp = os.path.join(path, "f0.parquet")
    pq.write_table(t, fp)
    s0 = os.path.getsize(fp)

    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "payload", "type": "variant", "nullable": True,
             "metadata": {}},
        ],
    })
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"commitInfo": {
            "timestamp": 1700000020000, "operation": "WRITE",
            "operationParameters": {"mode": "ErrorIfExists",
                                    "partitionBy": "[]"},
            "engineInfo": "Apache-Spark/4.0.0 Delta-Lake/4.0.0",
        }}) + "\n")
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["variantType", "variantShredding"],
            "writerFeatures": ["variantType", "variantShredding",
                               "appendOnly", "invariants"],
        }}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "aaaabbbb-cccc-dddd-eeee-ffff00001111",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string,
            "partitionColumns": [],
            "configuration": {"delta.enableVariantShredding": "true"},
            "createdTime": 1700000020000,
        }}) + "\n")
        f.write(json.dumps({"add": {
            "path": "f0.parquet", "partitionValues": {},
            "size": s0, "modificationTime": 1700000020000,
            "dataChange": True,
            "stats": json.dumps({"numRecords": 5,
                                 "minValues": {"k": 1},
                                 "maxValues": {"k": 5},
                                 "nullCount": {"k": 0}}),
        }}) + "\n")
    print(f"delta_variant_shredded_golden: {path}")


def gen_iceberg_v3_lineage(root: str) -> None:
    """v3 golden tree with ROW LINEAGE enabled the way a spec-v3 writer
    stamps it: metadata ``next-row-id``, per-snapshot ``first-row-id``,
    ``first_row_id`` on manifest-list entries (field-id 520) and on data
    file entries (field-id 146, null = inherit from the manifest). A
    reader that chokes on the extra Avro/JSON fields — or mistakes them
    for data columns — fails here; the spec says scans may simply ignore
    them."""
    path = os.path.join(root, "iceberg_v3_lineage_golden")
    shutil.rmtree(path, ignore_errors=True)
    meta_dir = os.path.join(path, "metadata")
    data_dir = os.path.join(path, "data")
    os.makedirs(meta_dir)
    os.makedirs(data_dir)
    sync = bytes(range(16))

    def idfield(name, typ, fid):
        return pa.field(
            name, typ, metadata={b"PARQUET:field_id": str(fid).encode()}
        )

    def write_data(name, ks, vs):
        fp = os.path.join(data_dir, name)
        pq.write_table(
            pa.table(
                [pa.array(ks, pa.int64()), pa.array(vs, pa.int64())],
                schema=pa.schema(
                    [idfield("k", pa.int64(), 1), idfield("v", pa.int64(), 2)]
                ),
            ),
            fp,
        )
        return fp

    f1 = write_data("f1.parquet", [1, 2, 3], [10, 20, 30])
    f2 = write_data("f2.parquet", [4, 5], [40, 50])

    entry_schema = manifest_schema([])
    entry_schema["fields"][-1]["type"]["fields"] += [
        # v3 row lineage: data file's first assigned row id (null =
        # inherit the manifest entry's), spec field-id 146
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 146},
    ]

    def entry(fpath, n, *, seq, first_row_id=None):
        return {
            "status": 1, "snapshot_id": 9000 + seq,
            "sequence_number": seq, "file_sequence_number": seq,
            "data_file": {
                "content": 0, "file_path": "file://" + fpath,
                "file_format": "PARQUET", "partition": {},
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(fpath),
                "value_counts": None, "null_value_counts": None,
                "lower_bounds": None, "upper_bounds": None,
                "split_offsets": None, "equality_ids": None,
                "sort_order_id": None,
                "first_row_id": first_row_id,
            },
        }

    m1 = os.path.join(meta_dir, "m1.avro")
    # explicit file-level first_row_id on the first file
    write_avro(m1, entry_schema, [entry(f1, 3, seq=1, first_row_id=0)], sync)
    m2 = os.path.join(meta_dir, "m2.avro")
    # null file-level id: inherited from the manifest's first_row_id
    write_avro(m2, entry_schema, [entry(f2, 2, seq=2)], sync)

    ml_schema = json.loads(json.dumps(ML_SCHEMA))
    ml_schema["fields"] += [
        # manifest-list first_row_id, spec field-id 520
        {"name": "first_row_id", "type": ["null", "long"],
         "default": None, "field-id": 520},
    ]

    def ml_entry(mp, *, seq, rows, first_row_id):
        return {
            "manifest_path": "file://" + mp,
            "manifest_length": os.path.getsize(mp),
            "partition_spec_id": 0, "content": 0,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": 9000 + seq,
            "added_data_files_count": 1,
            "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
            "added_rows_count": rows,
            "existing_rows_count": 0, "deleted_rows_count": 0,
            "partitions": None,
            "first_row_id": first_row_id,
        }

    ml1 = os.path.join(meta_dir, "snap-9001.avro")
    write_avro(ml1, ml_schema, [ml_entry(m1, seq=1, rows=3,
                                         first_row_id=0)], sync)
    ml2 = os.path.join(meta_dir, "snap-9002.avro")
    write_avro(ml2, ml_schema, [
        ml_entry(m1, seq=1, rows=3, first_row_id=0),
        ml_entry(m2, seq=2, rows=2, first_row_id=3),
    ], sync)
    meta = {
        "format-version": 3,
        "table-uuid": "55556666-7777-8888-9999-aaaabbbbcccc",
        "location": path,
        "last-sequence-number": 2,
        "last-updated-ms": 1700000002000,
        "last-column-id": 2,
        "next-row-id": 5,
        "row-lineage": True,
        "current-schema-id": 0,
        "schemas": [{
            "type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "k", "required": False, "type": "long"},
                {"id": 2, "name": "v", "required": False, "type": "long"},
            ],
        }],
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}],
        "properties": {},
        "current-snapshot-id": 9002,
        "snapshots": [
            {"snapshot-id": 9001, "sequence-number": 1,
             "timestamp-ms": 1700000001000, "first-row-id": 0,
             "added-rows": 3,
             "manifest-list": "file://" + ml1, "schema-id": 0,
             "summary": {"operation": "append"}},
            {"snapshot-id": 9002, "sequence-number": 2,
             "timestamp-ms": 1700000002000, "first-row-id": 3,
             "added-rows": 2,
             "manifest-list": "file://" + ml2, "schema-id": 0,
             "summary": {"operation": "append"}},
        ],
        "snapshot-log": [
            {"snapshot-id": 9001, "timestamp-ms": 1700000001000},
            {"snapshot-id": 9002, "timestamp-ms": 1700000002000},
        ],
        "metadata-log": [],
        "refs": {"main": {"snapshot-id": 9002, "type": "branch"}},
    }
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as f:
        json.dump(meta, f, indent=2)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as f:
        f.write("2")
    print(f"iceberg_v3_lineage_golden: {path}")


if __name__ == "__main__":
    os.makedirs(ROOT, exist_ok=True)
    gen_delta(ROOT)
    gen_iceberg(ROOT)
    gen_iceberg_v3(ROOT)
    gen_iceberg_mixed(ROOT)
    gen_delta_variant(ROOT)
    gen_delta_variant_shredded(ROOT)
    gen_iceberg_v3_lineage(ROOT)
