"""Minimal pure-Python Avro 1.x object-container codec — enough to read
and write Iceberg manifest / manifest-list files with zero jars and zero
third-party Avro libraries (none ship in this environment).

Implements the PUBLIC Avro specification
(https://avro.apache.org/docs/current/specification/): zigzag-varint
ints/longs, IEEE little-endian floats, length-prefixed bytes/strings,
records / enums / fixed / arrays / maps / unions, named-type references,
and the object container file format (magic ``Obj\\x01``, file-metadata
map carrying ``avro.schema``/``avro.codec``, sync-marker-delimited data
blocks, ``null`` and ``deflate`` codecs).

Scope: decoding follows the WRITER schema embedded in the container (no
schema resolution/promotion — Iceberg readers always have the writer
schema in-file, which is the case this exists for). Logical types ride
through as their underlying primitives, matching how Iceberg consumes
them. Values map to plain Python: record -> dict, array -> list,
map -> dict, enum -> symbol string, union -> branch value, null -> None.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib

_MAGIC = b"Obj\x01"

_PRIMITIVES = {
    "null", "boolean", "int", "long", "float", "double", "bytes", "string"
}


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------
def _read_long(buf: io.BytesIO) -> int:
    """zigzag varint (int and long share the wire format)."""
    shift = 0
    acc = 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        byte = b[0]
        acc |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = (n << 1) ^ (n >> 63) if n >= 0 else ((-n - 1) << 1) | 1
    # equivalent zigzag for arbitrary ints:
    if n < 0:  # pragma: no cover - zigzag above never yields negative
        raise ValueError
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    data = buf.read(n)
    if len(data) != n:
        raise EOFError("truncated bytes")
    return data


def _write_bytes(out: io.BytesIO, data: bytes) -> None:
    _write_long(out, len(data))
    out.write(data)


# ---------------------------------------------------------------------------
# schema-driven decode / encode
# ---------------------------------------------------------------------------
class _Names:
    """Registry of named types (record/enum/fixed) for by-name references."""

    def __init__(self):
        self.types: dict[str, dict] = {}

    def resolve(self, schema):
        if isinstance(schema, str) and schema not in _PRIMITIVES:
            try:
                return self.types[schema]
            except KeyError:
                raise ValueError(f"unknown named type {schema!r}") from None
        return schema

    def register(self, schema: dict) -> None:
        name = schema.get("name")
        if name:
            ns = schema.get("namespace")
            self.types[name] = schema
            if ns:
                self.types[f"{ns}.{name}"] = schema


def _decode(schema, buf: io.BytesIO, names: _Names):
    schema = names.resolve(schema)
    if isinstance(schema, list):  # union
        idx = _read_long(buf)
        if not 0 <= idx < len(schema):
            raise ValueError(f"union branch {idx} out of range")
        return _decode(schema[idx], buf, names)
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):  # {"type": {...nested...}}
            return _decode(t, buf, names)
    if t == "null":
        return None
    if t == "boolean":
        return buf.read(1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if t == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        names.register(schema)
        return buf.read(schema["size"])
    if t == "enum":
        names.register(schema)
        return schema["symbols"][_read_long(buf)]
    if t == "record":
        names.register(schema)
        out = {}
        for f in schema["fields"]:
            out[f["name"]] = _decode(f["type"], buf, names)
        return out
    if t == "array":
        items = []
        while True:
            count = _read_long(buf)
            if count == 0:
                break
            if count < 0:
                count = -count
                _read_long(buf)  # block byte size, unused on read
            for _ in range(count):
                items.append(_decode(schema["items"], buf, names))
        return items
    if t == "map":
        out = {}
        while True:
            count = _read_long(buf)
            if count == 0:
                break
            if count < 0:
                count = -count
                _read_long(buf)
            for _ in range(count):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = _decode(schema["values"], buf, names)
        return out
    raise ValueError(f"unsupported Avro type {t!r}")


def _encode(schema, value, out: io.BytesIO, names: _Names) -> None:
    schema = names.resolve(schema)
    if isinstance(schema, list):  # union: pick the first matching branch
        for idx, branch in enumerate(schema):
            if _matches(branch, value, names):
                _write_long(out, idx)
                _encode(branch, value, out, names)
                return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    if isinstance(schema, str):
        t = schema
    else:
        t = schema["type"]
        if isinstance(t, (dict, list)):
            _encode(t, value, out, names)
            return
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(value))
    elif t == "float":
        out.write(struct.pack("<f", float(value)))
    elif t == "double":
        out.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        _write_bytes(out, bytes(value))
    elif t == "string":
        _write_bytes(out, value.encode("utf-8"))
    elif t == "fixed":
        names.register(schema)
        if len(value) != schema["size"]:
            raise ValueError("fixed size mismatch")
        out.write(bytes(value))
    elif t == "enum":
        names.register(schema)
        _write_long(out, schema["symbols"].index(value))
    elif t == "record":
        names.register(schema)
        for f in schema["fields"]:
            try:
                v = value[f["name"]]
            except KeyError:
                # writer-side default fallback: lets records decoded from
                # an OLDER writer schema re-encode under a schema that
                # gained an optional field (e.g. a carried-forward
                # manifest entry predating equality_ids)
                if "default" in f:
                    v = f["default"]
                else:
                    raise ValueError(
                        f"record field {f['name']!r} missing in "
                        f"{sorted(value)}"
                    ) from None
            _encode(f["type"], v, out, names)
    elif t == "array":
        if value:
            _write_long(out, len(value))
            for item in value:
                _encode(schema["items"], item, out, names)
        _write_long(out, 0)
    elif t == "map":
        if value:
            _write_long(out, len(value))
            for k, v in value.items():
                _write_bytes(out, k.encode("utf-8"))
                _encode(schema["values"], v, out, names)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported Avro type {t!r}")


def _matches(branch, value, names: _Names) -> bool:
    branch = names.resolve(branch)
    t = branch if isinstance(branch, str) else branch.get("type")
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return False


# ---------------------------------------------------------------------------
# object container files
# ---------------------------------------------------------------------------
def read_container(path: str) -> tuple[dict, list, dict]:
    """Read an Avro object container file -> (schema, records, metadata)."""
    with open(path, "rb") as f:
        raw = f.read()
    buf = io.BytesIO(raw)
    if buf.read(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro container file")
    meta_names = _Names()
    meta = _decode({"type": "map", "values": "bytes"}, buf, meta_names)
    sync = buf.read(16)
    schema = json.loads(meta[b"avro.schema"] if b"avro.schema" in meta else meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    if isinstance(codec, bytes):
        codec = codec.decode()
    records = []
    while buf.tell() < len(raw):
        count = _read_long(buf)
        size = _read_long(buf)
        block = buf.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        bbuf = io.BytesIO(block)
        names = _Names()
        for _ in range(count):
            records.append(_decode(schema, bbuf, names))
        marker = buf.read(16)
        if marker != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, records, {
        (k.decode() if isinstance(k, bytes) else k): v for k, v in meta.items()
    }


def write_container(
    path: str,
    schema: dict,
    records: list,
    metadata: dict | None = None,
    codec: str = "null",
) -> None:
    """Write records as a single-block Avro object container file."""
    body = io.BytesIO()
    names = _Names()
    for rec in records:
        _encode(schema, rec, body, names)
    block = body.getvalue()
    if codec == "deflate":
        block = zlib.compress(block)[2:-4]  # raw deflate, no zlib header
    elif codec != "null":
        raise ValueError(f"unsupported codec {codec!r}")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v.encode() if isinstance(v, str) else v
    out = io.BytesIO()
    out.write(_MAGIC)
    _encode({"type": "map", "values": "bytes"}, meta, out, _Names())
    sync = os.urandom(16)
    out.write(sync)
    _write_long(out, len(records))
    _write_long(out, len(block))
    out.write(block)
    out.write(sync)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out.getvalue())
    os.replace(tmp, path)
