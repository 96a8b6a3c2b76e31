"""Driver-side parquet footer field-id extraction, shared by the Delta
(``columnMapping=id``) and Iceberg (field-id resolution) read paths.

Both formats resolve columns by integer field ID when data files carry
parquet ``field_id`` metadata (Delta PROTOCOL.md § Column Mapping;
Iceberg spec § Parquet — "Field IDs are required"). Spark's global
``spark.sql.parquet.fieldId.read.enabled`` conf is consulted at ACTION
time (verified empirically: flipping it after ``spark.read`` but before
``.collect()`` changes the result), so a reader that flips it (a) leaves
a lasting side effect on the shared session and (b) cannot express
per-file resolution for a MIXED table — some files with IDs under
pre-rename physical names, some without — which Spark's single-conf
path cannot read correctly at all.

Instead the readers resolve IDs themselves: one parallel footer-METADATA
read per live file here (no row groups touched — a footer read is the
same O(KB) fetch Spark's own scan planning performs executor-side), then
each distinct ``{field id -> physical name}`` mapping becomes its own
scan group whose columns are aliased back to the canonical schema. The
number of groups is bounded by the number of schema evolutions the
table has seen, never by file count, so the unioned plan stays small at
any scale; at 100 TB the footer sweep is the driver-side analogue of
manifest planning and parallelizes across the thread pool.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

__all__ = [
    "parquet_field_id_mappings",
    "group_paths_by_mapping",
    "parquet_footer_columns",
]

#: (abs path, size, mtime_ns) -> {field id -> physical name}. Data files
#: in every format here are IMMUTABLE once committed (uuid-named, never
#: appended), so a size+mtime key is a sound identity and repeated scans
#: of the same snapshot skip the footer I/O entirely. Bounded eviction
#: keeps a long-lived driver from accumulating unboundedly.
_CACHE: dict[tuple, dict[int, str]] = {}
_CACHE_MAX = 65536


def parquet_field_id_mappings(
    paths: list[str], max_workers: int = 16
) -> dict[str, dict[int, str]]:
    """Per file, the ``{parquet field id -> physical column name}``
    mapping from its footer (empty when the file carries no field IDs).
    Raises — never silently degrades to name resolution — when a footer
    cannot be read: a table whose footers are unreadable must fail at
    plan time, not return wrong rows at scan time. Results are memoized
    on (path, size, mtime), so only a snapshot's NEW files pay the
    footer read on repeat scans."""
    import pyarrow.parquet as pq

    def one(p: str) -> dict[int, str]:
        try:
            st = os.stat(p)
            key = (os.path.abspath(p), st.st_size, st.st_mtime_ns)
            hit = _CACHE.get(key)
            if hit is not None:
                return hit
            sch = pq.ParquetFile(p).schema_arrow
        except Exception as exc:  # noqa: BLE001 — re-raised, loud
            raise IOError(
                f"cannot read parquet footer of {p}: {exc}"
            ) from exc
        out: dict[int, str] = {}
        for f in sch:
            md = f.metadata or {}
            fid = md.get(b"PARQUET:field_id")
            if fid is not None:
                out[int(fid)] = f.name
        if len(_CACHE) >= _CACHE_MAX:
            _CACHE.clear()
        _CACHE[key] = out
        return out

    if not paths:
        return {}
    with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
        return dict(zip(paths, ex.map(one, paths)))


#: (abs path, size, mtime_ns) -> frozenset of top-level column names —
#: same immutability argument and bounded eviction as _CACHE above.
_NAME_CACHE: dict[tuple, frozenset] = {}


def parquet_footer_columns(
    paths: list[str], max_workers: int = 16
) -> dict[str, frozenset]:
    """Per file, the set of TOP-LEVEL column names in its footer
    schema. Proves column ABSENCE by name for files without field IDs
    (the migrated-file shape): an identity-partition source column
    absent from the bytes must read as the partition constant, not
    NULL. Loud on unreadable footers, memoized on (path, size,
    mtime)."""
    import pyarrow.parquet as pq

    def one(p: str) -> frozenset:
        try:
            st = os.stat(p)
            key = (os.path.abspath(p), st.st_size, st.st_mtime_ns)
            hit = _NAME_CACHE.get(key)
            if hit is not None:
                return hit
            names = frozenset(pq.ParquetFile(p).schema_arrow.names)
        except Exception as exc:  # noqa: BLE001 — re-raised, loud
            raise IOError(
                f"cannot read parquet footer of {p}: {exc}"
            ) from exc
        if len(_NAME_CACHE) >= _CACHE_MAX:
            _NAME_CACHE.clear()
        _NAME_CACHE[key] = names
        return names

    if not paths:
        return {}
    with ThreadPoolExecutor(max_workers=min(max_workers, len(paths))) as ex:
        return dict(zip(paths, ex.map(one, paths)))


def group_paths_by_mapping(
    paths: list[str], mappings: dict[str, dict[int, str]]
) -> list[tuple[dict[int, str], list[str]]]:
    """Group files by their exact footer mapping (deterministic order).
    Files without field IDs group under the empty mapping ``{}`` — the
    caller routes that group down name resolution."""
    groups: dict[tuple, list[str]] = {}
    for p in paths:
        sig = tuple(sorted(mappings.get(p, {}).items()))
        groups.setdefault(sig, []).append(p)
    return [(dict(sig), ps) for sig, ps in sorted(groups.items())]
