"""Delta deletion-vector codec layer — pure Python, public formats only.

Three public encodings compose into Delta Lake's deletion-vector (DV)
storage (PROTOCOL.md § "Deletion Vectors" and § "Deletion Vector
Format"; reference tables written by delta-spark with
``delta.enableDeletionVectors=true`` carry these in their ``add``
actions):

1. **Z85** (ZeroMQ RFC 32 base-85): DV file names embed a Z85-encoded
   UUID; inline DVs Z85-encode the whole payload. 4 bytes <-> 5 chars,
   big-endian groups.
2. **RoaringBitmapArray** (Delta's 64-bit roaring layout): a 4-byte
   little-endian magic ``1681511377`` then a "portable" body — an
   8-byte little-endian count of consecutive 32-bit bitmaps (index =
   the high 32 bits of the member values) followed by each bitmap in
   the standard RoaringBitmap portable serialization (cookies
   12346/12347; array / bitset / run containers).
3. **DV file framing**: a 1-byte format version (=1), then per stored
   DV ``<int32 BE size> <data> <int32 BE CRC-32(data)>``; the add
   action's ``offset`` points at the size word.

The decoder accepts everything a conforming writer may emit (both
cookies, all three container kinds); the encoder emits the
no-run-container form (cookie 12346, array/bitset containers), which
every reader must accept.

Scale note: these run per-FILE on executors (a DV describes one data
file); nothing here is proportional to table size.
"""

from __future__ import annotations

import struct
import zlib

# --------------------------------------------------------------------------
# Z85 (ZeroMQ RFC 32)
# --------------------------------------------------------------------------
_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_ALPHABET)}


def z85_encode(data: bytes) -> str:
    """Encode bytes (length must be a multiple of 4) as Z85."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (n,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_ALPHABET[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    """Decode Z85 text (length must be a multiple of 5) to bytes."""
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for c in text[i : i + 5]:
            try:
                n = n * 85 + _Z85_INDEX[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if n > 0xFFFFFFFF:
            raise ValueError("Z85 group overflows 32 bits")
        out += struct.pack(">I", n)
    return bytes(out)


# --------------------------------------------------------------------------
# 32-bit RoaringBitmap portable serialization
# --------------------------------------------------------------------------
_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4
_ARRAY_MAX = 4096


def _serialize_rb32(values: list[int]) -> bytes:
    """Portable-serialize a sorted list of uint32 values (no run
    containers: cookie 12346, array <=4096-cardinality containers,
    bitset above)."""
    # group by high-16 key
    containers: list[tuple[int, list[int]]] = []
    cur_key, cur_vals = None, None
    for v in values:
        key = v >> 16
        if key != cur_key:
            cur_key, cur_vals = key, []
            containers.append((key, cur_vals))
        cur_vals.append(v & 0xFFFF)
    buf = bytearray()
    buf += struct.pack("<II", _SERIAL_COOKIE_NO_RUN, len(containers))
    for key, vals in containers:
        buf += struct.pack("<HH", key, len(vals) - 1)
    # offset header (always present for the no-run cookie)
    offset = len(buf) + 4 * len(containers)
    for _, vals in containers:
        buf += struct.pack("<I", offset)
        offset += (
            2 * len(vals) if len(vals) <= _ARRAY_MAX else 8192
        )
    for _, vals in containers:
        if len(vals) <= _ARRAY_MAX:
            buf += struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for lo in vals:
                words[lo >> 6] |= 1 << (lo & 63)
            buf += struct.pack("<1024Q", *words)
    return bytes(buf)


def _deserialize_rb32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """Parse one portable 32-bit roaring bitmap at ``buf[pos:]``; return
    (sorted uint32 values, next position)."""
    (cookie,) = struct.unpack_from("<I", buf, pos)
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n_containers = (cookie >> 16) + 1
        pos += 4
        nbytes = (n_containers + 7) // 8
        run_flags = buf[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n_containers >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n_containers,) = struct.unpack_from("<I", buf, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"bad roaring cookie {cookie}")

    keys_cards = []
    for _ in range(n_containers):
        key, card_m1 = struct.unpack_from("<HH", buf, pos)
        pos += 4
        keys_cards.append((key, card_m1 + 1))
    if has_offsets:
        pos += 4 * n_containers  # offsets are redundant for a linear parse

    def is_run(i: int) -> bool:
        return bool(run_flags) and bool(run_flags[i // 8] & (1 << (i % 8)))

    out: list[int] = []
    for i, (key, card) in enumerate(keys_cards):
        base = key << 16
        if is_run(i):
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(n_runs):
                start, length_m1 = struct.unpack_from("<HH", buf, pos)
                pos += 4
                out.extend(base + v for v in range(start, start + length_m1 + 1))
        elif card <= _ARRAY_MAX:
            vals = struct.unpack_from(f"<{card}H", buf, pos)
            pos += 2 * card
            out.extend(base + v for v in vals)
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            for wi, w in enumerate(words):
                while w:
                    b = w & -w
                    out.append(base + (wi << 6) + b.bit_length() - 1)
                    w ^= b
    return out, pos


# --------------------------------------------------------------------------
# RoaringBitmapArray (Delta's 64-bit layout)
# --------------------------------------------------------------------------
_MAGIC = 1681511377


def serialize_positions(positions) -> bytes:
    """Serialize sorted (or unsorted) uint64 row positions as a Delta
    RoaringBitmapArray blob (magic + portable body)."""
    vals = sorted(set(int(p) for p in positions))
    if vals and (vals[0] < 0 or vals[-1] >> 32 >= 2**31):
        raise ValueError("position out of RoaringBitmapArray range")
    # bucket by high-32; buckets are CONSECUTIVE from 0 (empty ones
    # serialized empty) because the index IS the key
    n_buckets = (vals[-1] >> 32) + 1 if vals else 0
    buckets: list[list[int]] = [[] for _ in range(n_buckets)]
    for v in vals:
        buckets[v >> 32].append(v & 0xFFFFFFFF)
    body = bytearray()
    body += struct.pack("<Q", n_buckets)
    for b in buckets:
        body += _serialize_rb32(b)
    return struct.pack("<I", _MAGIC) + bytes(body)


def deserialize_positions(blob: bytes) -> list[int]:
    """Parse a Delta RoaringBitmapArray blob into sorted row positions."""
    (magic,) = struct.unpack_from("<I", blob, 0)
    if magic != _MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    (n_buckets,) = struct.unpack_from("<Q", blob, 4)
    pos = 12
    out: list[int] = []
    for idx in range(n_buckets):
        vals, pos = _deserialize_rb32(blob, pos)
        base = idx << 32
        out.extend(base + v for v in vals)
    return out


# --------------------------------------------------------------------------
# DV file framing
# --------------------------------------------------------------------------
def write_dv_file(path: str, blobs: list[bytes]) -> list[tuple[int, int]]:
    """Write a DV file (format version 1) holding ``blobs``; return the
    per-blob (offset, sizeInBytes) descriptor fields."""
    spans = []
    with open(path, "wb") as f:
        f.write(b"\x01")
        off = 1
        for blob in blobs:
            f.write(struct.pack(">i", len(blob)))
            f.write(blob)
            f.write(struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF))
            spans.append((off, len(blob)))
            off += 4 + len(blob) + 4
    return spans


_PUFFIN_MAGIC = b"PFA1"


def write_puffin_dvs(
    path: str,
    dvs: list[tuple[str, bytes, int]],
    snapshot_id: int,
    sequence_number: int,
) -> list[tuple[int, int]]:
    """Write a spec-compliant Puffin file holding one
    ``deletion-vector-v1`` blob per ``(referenced_data_file, blob,
    cardinality)`` (Iceberg v3 § Deletion vectors / Puffin spec): magic,
    per-DV framing (int32 BE length + data + int32 BE CRC-32 — byte-
    compatible with Delta's DV framing, which is why roaring64 serves
    both), then the footer (magic + JSON payload describing each blob +
    LE payload size + flags + magic). Returns per-DV
    ``(content_offset, content_size_in_bytes)`` where the size counts
    the TOTAL stored blob per the footer contract (length word + data
    + CRC), matching read_dv_blob's "total" semantics."""
    import json as _json

    out = bytearray(_PUFFIN_MAGIC)
    spans: list[tuple[int, int]] = []
    blob_meta = []
    for ref, blob, card in dvs:
        off = len(out)
        framed = (
            struct.pack(">i", len(blob))
            + blob
            + struct.pack(">I", zlib.crc32(blob) & 0xFFFFFFFF)
        )
        out += framed
        spans.append((off, len(framed)))
        blob_meta.append(
            {
                "type": "deletion-vector-v1",
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": off,
                "length": len(framed),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(card),
                },
            }
        )
    payload = _json.dumps(
        {"blobs": blob_meta, "properties": {}}
    ).encode()
    out += _PUFFIN_MAGIC + payload
    out += struct.pack("<i", len(payload)) + b"\x00\x00\x00\x00"
    out += _PUFFIN_MAGIC
    with open(path, "wb") as f:
        f.write(bytes(out))
    return spans


def read_dv_blob(
    path: str,
    offset: int,
    size_in_bytes: int | None = None,
    size_semantics: str = "data",
) -> bytes:
    """Read one DV blob at ``offset`` (which points at the int32 BE size
    word), verifying the trailing CRC-32.

    ``size_semantics`` declares what the caller's descriptor length
    counts: ``"data"`` (Delta ``sizeInBytes``: the serialized bitmap
    only, i.e. the value of the length word) or ``"total"`` (Iceberg v3
    ``content_size_in_bytes``: the TOTAL stored blob per the Puffin
    footer, including the 4-byte length prefix and 4-byte CRC — data+8 —
    so readers can fetch the blob in one ranged read; the data-only
    reading is also accepted for lenient interop with writers that
    recorded the inner length)."""
    with open(path, "rb") as f:
        f.seek(offset)
        (size,) = struct.unpack(">i", f.read(4))
        if size_in_bytes is not None:
            ok = (
                size_in_bytes in (size + 8, size)
                if size_semantics == "total"
                else size == size_in_bytes
            )
            if not ok:
                raise ValueError(
                    f"DV size mismatch at {path}:{offset}: "
                    f"file says {size} ({size_semantics} semantics), "
                    f"descriptor says {size_in_bytes}"
                )
        blob = f.read(size)
        (crc,) = struct.unpack(">I", f.read(4))
    if zlib.crc32(blob) & 0xFFFFFFFF != crc:
        raise ValueError(f"DV checksum mismatch at {path}:{offset}")
    return blob
