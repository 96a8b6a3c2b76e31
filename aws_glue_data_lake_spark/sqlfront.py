"""SQL front door for the ``open_table`` facade.

The reference drives its Iceberg upsert through ``spark.sql`` text — a
MERGE statement template (reference icberg/iceberg_tables.py:45-50,
executed at :143-146) and plain SELECTs over catalog names. This engine's
tables live at filesystem paths with three interchangeable layouts, so
:func:`sql` accepts the same statement TEXT and delegates to the facade's
already-green primitives:

- ``MERGE INTO <target> AS t USING <view> AS s ON t.k = s.k
  WHEN MATCHED THEN DELETE`` — the reference's exact template shape —
  and ``... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT
  *`` (delta/delta_tables.py:159-160's API equivalent). Anything else
  fails loudly: a silently-misparsed MERGE is how tables rot.
- ``SELECT ... FROM <table> [VERSION AS OF n | TIMESTAMP AS OF ts]`` —
  time-travel reads resolve through the facade, everything else in the
  statement stays Spark SQL (Catalyst sees one rewritten SELECT, so
  pushdown/pruning behave exactly as a plain view read).
- ``CREATE EXTERNAL TABLE IF NOT EXISTS <name> LOCATION '<path>'
  TBLPROPERTIES ('table_type'='DELTA')`` — the reference's Athena
  registration text VERBATIM (delta/delta_tables.py:41-47): binds the
  name to the layout in the session catalog (catalog.py); after it,
  the name resolves everywhere below.
- ``UPDATE <table> SET col = expr[, ...] [WHERE pred]``,
  ``DELETE FROM <table> WHERE pred`` and ``INSERT INTO <table>
  SELECT ...|VALUES ...`` — the simple DML shapes delta-spark users
  reach for, delegating to the facade's single-commit ``update_where``
  / ``delete_where`` / ``append`` (CoW file rewrite with matched-file
  discovery / MoR tombstones / plain append; VALUES maps positionally).
- Maintenance + metadata DDL: ``OPTIMIZE <t> [ZORDER BY (c, ...)]``
  (compaction; z-ordered multi-dimensional clustering on delta),
  ``VACUUM <t> [RETAIN n VERSIONS | RETAIN n HOURS] [DRY RUN]``
  (version-based retention; the Delta-SQL HOURS spelling maps onto
  versions from commit timestamps, conservatively; DRY RUN returns the
  would-be-deleted paths as a DataFrame, deleting nothing),
  ``REORG TABLE <t> APPLY (PURGE)`` (targeted rewrite of DV-bearing /
  dropped-column-bearing files only),
  ``TRUNCATE TABLE <t>`` (drop every row, metadata-only commit),
  ``RESTORE TABLE <t> TO VERSION AS OF n | TIMESTAMP AS OF 'ts'``
  (roll the live state back as a new commit; TIMESTAMP on delta),
  ``SHOW TBLPROPERTIES <t> [('key')]`` (property map as a DataFrame),
  ``DESCRIBE HISTORY <t>`` / ``DESCRIBE DETAIL <t>`` (metadata
  relations as DataFrames), ``ALTER TABLE <t> ADD CONSTRAINT <n>
  CHECK (<e>) / DROP CONSTRAINT <n> / SET TBLPROPERTIES (...) /
  CLUSTER BY (<cols>) | NONE`` (delta liquid clustering — OPTIMIZE
  then clusters by the declared columns).
- ``CREATE TABLE [IF NOT EXISTS] <name> USING delta|iceberg|lake
  [PARTITIONED BY (...)] [CLUSTER BY (...)] [LOCATION '<path>']
  AS SELECT ...`` — CTAS that creates the format table AND binds the
  name; managed placement under the warehouse dir when LOCATION is
  omitted; CLUSTER BY creates a delta liquid-clustered table.
- ``SELECT ... FROM table_changes('<t>', start[, end])`` — delta-spark's
  CDF table-valued function, rewritten to the facade ``changes()`` read.

Table references resolve through the ``tables`` mapping (statement
identifier -> path or :class:`~aws_glue_data_lake_spark.table.Table`),
or inline as ``delta.`/path``` / ``iceberg.`/path``` / ``lake.`/path```
(delta-spark's path-literal form), or as a bare path containing ``/``
(layout auto-detected), or as a CATALOG NAME bound via catalog.py — the
reference's ``spark.table(f'{CATALOG}.{DATABASE}.{TABLE}')`` flow
(icberg/iceberg_tables.py:65-66); bound names in SELECT FROM/JOIN
positions also read through the facade (a raw scan of the binding entry
would ignore the transaction log). Scale: the shim only REWRITES text
and registers temp views over facade reads — no extra materialization;
MERGE delegates to the pruned CoW / O(batch) MoR write paths unchanged.
"""

from __future__ import annotations

import re
import uuid as _uuid

from pyspark.sql import DataFrame, SparkSession

from aws_glue_data_lake_spark.localdf import local_df

from aws_glue_data_lake_spark.table import Table, open_table

__all__ = ["sql"]

_MERGE_RE = re.compile(
    r"^\s*MERGE\s+INTO\s+(?P<target>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)"
    r"\s+(?:AS\s+)?(?P<talias>\w+)"
    r"\s+USING\s+(?P<source>[\w.]+)\s+(?:AS\s+)?(?P<salias>\w+)"
    r"\s+ON\s+(?P<cond>.+?)"
    r"\s+(?P<clauses>WHEN\s+.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_PATH_LITERAL_RE = re.compile(
    r"^(?P<fmt>delta|iceberg|lake)\.`(?P<path>[^`]+)`$", re.IGNORECASE
)
_TIME_TRAVEL_RE = re.compile(
    r"(?P<ref>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)\s+"
    r"(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+(?P<val>'[^']*'|\S+)",
    re.IGNORECASE,
)
#: the reference's Athena registration DDL, verbatim shape
#: (delta/delta_tables.py:41-47): no column list — schema comes from the
#: layout at LOCATION; table_type says which protocol reader owns it
_CREATE_EXTERNAL_RE = re.compile(
    r"^\s*CREATE\s+EXTERNAL\s+TABLE\s+"
    r"(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>`[^`]+`|[\w.]+)\s+"
    r"LOCATION\s+'(?P<path>[^']+)'\s*"
    r"(?:TBLPROPERTIES\s*\(\s*(?P<props>[^)]*)\s*\))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<target>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)\s+"
    r"SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<pred>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<target>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)\s+"
    r"WHERE\s+(?P<pred>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_INSERT_RE = re.compile(
    r"^\s*INSERT\s+INTO\s+(?P<target>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)\s+"
    r"(?P<body>(?:SELECT|VALUES|WITH|TABLE)\b.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_REF = r"(?P<target>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)"
_OPTIMIZE_RE = re.compile(
    rf"^\s*OPTIMIZE\s+{_REF}"
    r"(?:\s+ZORDER\s+BY\s*\(?\s*(?P<zcols>[\w`,\s]+?)\s*\)?)?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_TRUNCATE_RE = re.compile(
    rf"^\s*TRUNCATE\s+TABLE\s+{_REF}\s*;?\s*$", re.IGNORECASE
)
#: delta-spark's REORG TABLE <t> APPLY (PURGE): targeted rewrite of
#: DV-bearing / dropped-column-bearing files
_REORG_RE = re.compile(
    rf"^\s*REORG\s+TABLE\s+{_REF}\s+APPLY\s*\(\s*PURGE\s*\)\s*;?\s*$",
    re.IGNORECASE,
)
#: delta SQL is RETAIN n HOURS; this engine's vacuum is version-based.
#: Both spellings parse: VERSIONS passes through, HOURS maps onto a
#: trailing-version count from commit timestamps (Table._keep_for_hours)
_VACUUM_RE = re.compile(
    rf"^\s*VACUUM\s+{_REF}"
    r"(?:\s+RETAIN\s+(?P<n>\d+)\s+(?P<unit>VERSIONS|HOURS))?"
    r"(?:\s+(?P<dry>DRY\s+RUN))?\s*;?\s*$",
    re.IGNORECASE,
)
#: delta-spark's RESTORE TABLE <t> TO VERSION AS OF n (TIMESTAMP AS OF
#: maps through version_at_timestamp on delta)
_RESTORE_RE = re.compile(
    rf"^\s*RESTORE\s+TABLE\s+{_REF}\s+TO\s+"
    r"(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+(?P<val>'[^']*'|\S+)"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_SHOW_TBLPROPS_RE = re.compile(
    rf"^\s*SHOW\s+TBLPROPERTIES\s+{_REF}"
    r"(?:\s*\(\s*'(?P<key>[^']*)'\s*\))?\s*;?\s*$",
    re.IGNORECASE,
)
_DESCRIBE_HISTORY_RE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+HISTORY\s+{_REF}\s*;?\s*$", re.IGNORECASE
)
_DESCRIBE_DETAIL_RE = re.compile(
    rf"^\s*DESC(?:RIBE)?\s+DETAIL\s+{_REF}\s*;?\s*$", re.IGNORECASE
)
#: CREATE TABLE <name> USING delta|iceberg|lake [LOCATION '<path>']
#: [AS SELECT ...] — the delta-spark CREATE shapes; without LOCATION
#: the table is "managed" under the session warehouse dir
_CREATE_USING_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>`[^`]+`|[\w.]+)\s+"
    r"USING\s+(?P<fmt>delta|iceberg|lake)\s*"
    r"(?:PARTITIONED\s+BY\s*\(\s*(?P<pby>[\w,\s`]+?)\s*\)\s*)?"
    r"(?:CLUSTER\s+BY\s*\(\s*(?P<cby>[\w,\s`]+?)\s*\)\s*)?"
    r"(?:LOCATION\s+'(?P<path>[^']+)'\s*)?"
    r"(?:AS\s+(?P<body>SELECT\b.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
#: delta-spark's CREATE TABLE <tgt> SHALLOW CLONE <src>
#: [VERSION AS OF n | TIMESTAMP AS OF ts] — metadata-only table fork
_CREATE_CLONE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?"
    r"(?P<name>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)\s+"
    r"SHALLOW\s+CLONE\s+"
    r"(?P<src>`[^`]+`|[\w./$-]+(?:\.`[^`]+`)?)"
    r"(?:\s+(?P<kind>VERSION|TIMESTAMP)\s+AS\s+OF\s+"
    r"(?P<val>'[^']*'|\S+))?"
    r"\s*;?\s*$",
    re.IGNORECASE,
)
_ALTER_RE = re.compile(
    rf"^\s*ALTER\s+TABLE\s+{_REF}\s+(?P<action>.+?)\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)
#: delta-spark's CDF table-valued function:
#: SELECT ... FROM table_changes('<table>', start[, end])
_TABLE_CHANGES_RE = re.compile(
    r"table_changes\s*\(\s*'(?P<ref>[^']+)'\s*,\s*(?P<lo>\d+)"
    r"\s*(?:,\s*(?P<hi>\d+)\s*)?\)",
    re.IGNORECASE,
)
#: FROM/JOIN-position identifiers, for rewriting catalog-bound names in
#: SELECTs (alias.column tokens never sit in these positions)
_FROM_REF_RE = re.compile(
    r"(?P<kw>\bFROM\b|\bJOIN\b)\s+(?P<ref>`[^`]+`|[\w.]+)",
    re.IGNORECASE,
)


def _resolve(
    ref: str, tables: dict | None, spark: SparkSession | None = None
) -> Table | None:
    """A statement identifier -> facade handle, or None when the name is
    not ours (it stays for Spark SQL to resolve as a view/catalog
    table). Resolution order: the explicit ``tables`` mapping, the
    ``fmt.`/path``` literal, a bare path, then — given ``spark`` — the
    session catalog's format-table bindings (catalog.py, the
    reference's name-resolution flow)."""
    ref = ref.strip()
    if tables and ref in tables:
        t = tables[ref]
        return t if isinstance(t, Table) else open_table(str(t))
    m = _PATH_LITERAL_RE.match(ref)
    if m:
        return open_table(m.group("path"), m.group("fmt").lower())
    bare = ref.strip("`")
    if "/" in bare:
        return open_table(bare)
    if spark is not None:
        from aws_glue_data_lake_spark.catalog import binding

        b = binding(spark, bare)
        if b is not None:
            return open_table(*b)
    return None


def _merge_keys(cond: str, talias: str, salias: str) -> list[tuple[str, str]]:
    """Parse an ANDed equi-join MERGE condition into (target col, source
    col) pairs; anything non-equi fails loudly."""
    pairs = []
    for clause in re.split(r"\s+AND\s+", cond.strip(), flags=re.IGNORECASE):
        m = re.match(
            r"^\s*(\w+)\.(\w+)\s*=\s*(\w+)\.(\w+)\s*$", clause.strip()
        )
        if not m:
            raise ValueError(
                f"unsupported MERGE condition clause {clause!r}: only "
                "ANDed alias.col = alias.col equality is supported"
            )
        a1, c1, a2, c2 = m.groups()
        if a1.lower() == talias.lower() and a2.lower() == salias.lower():
            pairs.append((c1, c2))
        elif a1.lower() == salias.lower() and a2.lower() == talias.lower():
            pairs.append((c2, c1))
        else:
            raise ValueError(
                f"MERGE condition {clause!r} does not reference both "
                f"aliases {talias!r} and {salias!r}"
            )
    return pairs


def _alias_rewrite(expr: str, ta: str, sa: str) -> str:
    """Rewrite the statement's own aliases onto the engine's clause
    aliases: ``<ta>.col`` -> ``t.col``, ``<sa>.col`` -> ``s.col``."""
    e = re.sub(rf"\b{re.escape(ta)}\.", "t.", expr, flags=re.IGNORECASE)
    return re.sub(rf"\b{re.escape(sa)}\.", "s.", e, flags=re.IGNORECASE)


def _parse_clause_chain(text: str, ta: str, sa: str):
    """Generic MERGE WHEN-clause chain (delta-spark's full grammar less
    column-list INSERT): any number of ``WHEN MATCHED [AND p] THEN
    UPDATE SET (*|a = e, ...) | DELETE`` clauses (first-match-wins,
    in statement order) plus at most one ``WHEN NOT MATCHED [AND p]
    THEN INSERT *``. Returns (matched_clauses, insert?, insert_cond)
    or None when the text isn't such a chain (the caller raises the
    canonical unsupported-shape error)."""
    starts = [
        mm.start()
        for mm in re.finditer(
            r"(?i)\bWHEN\s+(?:NOT\s+)?MATCHED\b", text
        )
    ]
    if not starts or starts[0] != 0:
        return None
    segs = [
        text[a:b].strip()
        for a, b in zip(starts, starts[1:] + [len(text)])
    ]
    mcs: list[tuple] = []
    nm_list: list[tuple] = []  # (cond_or_None, set_dict_or_None=*)
    for seg in segs:
        mm = re.match(
            r"(?is)^WHEN\s+MATCHED(?:\s+AND\s+(?P<pred>.+?))?\s+THEN\s+"
            r"(?P<act>DELETE|UPDATE\s+SET\s+(?P<sets>.+?))\s*$",
            seg,
        )
        if mm:
            cond = (
                _alias_rewrite(mm.group("pred"), ta, sa)
                if mm.group("pred")
                else None
            )
            if mm.group("act").upper() == "DELETE":
                mcs.append(("delete", cond))
                continue
            sets_txt = mm.group("sets").strip()
            if sets_txt == "*":
                mcs.append(("update", cond, None))
                continue
            assigns: dict[str, str] = {}
            for part in _split_top_level(sets_txt):
                am = re.match(
                    r"^\s*(?:(\w+)\.)?`?([\w]+)`?\s*=\s*(.+?)\s*$",
                    part,
                    re.DOTALL,
                )
                if not am:
                    return None
                pfx = am.group(1)
                if pfx is not None and pfx.lower() != ta.lower():
                    raise ValueError(
                        f"MERGE SET target {part.strip()!r} must assign "
                        f"a target ({ta}) column"
                    )
                assigns[am.group(2)] = _alias_rewrite(
                    am.group(3), ta, sa
                )
            mcs.append(("update", cond, assigns))
            continue
        mm = re.match(
            r"(?is)^WHEN\s+NOT\s+MATCHED"
            r"(?:\s+AND\s+(?P<pred>.+?))?\s+THEN\s+INSERT\s+"
            r"(?:\*|\(\s*(?P<cols>[^)]*?)\s*\)\s+VALUES\s+"
            r"\(\s*(?P<vals>.+?)\s*\))\s*$",
            seg,
        )
        if mm:
            ins_cond = None
            ins_set = None
            pred = mm.group("pred")
            if pred:
                if re.search(
                    rf"\b{re.escape(ta)}\.", pred, re.IGNORECASE
                ):
                    raise ValueError(
                        f"NOT MATCHED insert predicate {pred!r} "
                        "references the target alias; by definition "
                        "these rows have no target match — use source "
                        "columns"
                    )
                ins_cond = re.sub(
                    rf"\b{re.escape(sa)}\.", "", pred,
                    flags=re.IGNORECASE,
                )
            if mm.group("cols") is not None:
                # column-list INSERT: assigned columns evaluate their
                # VALUES expression over the (bare) source row;
                # unassigned columns NULL-pad — SQL MERGE semantics
                cols = [
                    c.strip().strip("`")
                    for c in mm.group("cols").split(",")
                    if c.strip()
                ]
                cols = [
                    re.sub(
                        rf"(?i)^{re.escape(ta)}\.", "", c
                    ) for c in cols
                ]
                vals = _split_top_level(mm.group("vals"))
                if len(cols) != len(vals):
                    raise ValueError(
                        f"INSERT column list has {len(cols)} columns "
                        f"but VALUES has {len(vals)} expressions"
                    )
                ins_set = {
                    c: re.sub(
                        rf"\b{re.escape(sa)}\.", "", v.strip(),
                        flags=re.IGNORECASE,
                    )
                    for c, v in zip(cols, vals)
                }
                for v in ins_set.values():
                    if re.search(
                        rf"\b{re.escape(ta)}\.", v, re.IGNORECASE
                    ):
                        raise ValueError(
                            f"INSERT VALUES expression {v!r} "
                            "references the target alias; inserts "
                            "have no target row"
                        )
            if nm_list and nm_list[-1][0] is None:
                raise ValueError(
                    "WHEN NOT MATCHED clause without a condition must "
                    "be last: every later clause would be unreachable "
                    "(delta-spark's rule)"
                )
            nm_list.append((ins_cond, ins_set))
            continue
        return None
    if not mcs:
        if not nm_list:
            return None
        # INSERT-only chain: a never-firing clause carries every
        # matched row unchanged while the insert leg gates on the
        # anti-join the clause path already computes
        mcs = [("delete", "false")]
    if len(nm_list) > 1:
        # chained not-matched clauses: first-match-wins, shipped as
        # the not_matched_clauses list (mergeclauses machinery)
        return mcs, True, None, None, nm_list
    ins_cond, ins_set = nm_list[0] if nm_list else (None, None)
    return mcs, bool(nm_list), ins_cond, ins_set, None


def _run_merge(spark: SparkSession, m: re.Match, tables: dict | None) -> None:
    target = _resolve(m.group("target"), tables, spark)
    if target is None:
        raise ValueError(
            f"MERGE target {m.group('target')!r} is not a known table "
            "(pass it in `tables=` or use the fmt.`/path` literal form)"
        )
    source = spark.table(m.group("source"))
    pairs = _merge_keys(m.group("cond"), m.group("talias"), m.group("salias"))
    # align source columns to the target key names
    src = source
    for tcol, scol in pairs:
        if tcol != scol:
            src = src.withColumnRenamed(scol, tcol)
    keys = [tcol for tcol, _ in pairs]
    clauses = re.sub(r"\s+", " ", m.group("clauses")).strip()
    # optional THIRD clause (delta-spark's three-clause merge): WHEN
    # NOT MATCHED BY SOURCE [AND <target pred>] THEN DELETE | UPDATE
    # SET a = expr, ... — peeled off the tail before the two-clause
    # shapes match below
    nmbs_kwargs: dict = {}
    nmbs_parts = re.split(
        r"(?i)\s+(?=WHEN NOT MATCHED BY SOURCE\b)", clauses
    )
    if len(nmbs_parts) > 1:
        clauses = nmbs_parts[0].strip()
        nmbs_clauses: list[tuple] = []
        for seg in nmbs_parts[1:]:
            nm = re.match(
                r"^WHEN NOT MATCHED BY SOURCE"
                r"(?: AND (?P<pred>.+?))? THEN "
                r"(?P<act>DELETE|UPDATE SET (?P<sets>.+?))\s*$",
                seg.strip(),
                re.IGNORECASE | re.DOTALL,
            )
            if not nm:
                raise ValueError(
                    f"cannot parse NMBS clause {seg.strip()!r}: "
                    "expected WHEN NOT MATCHED BY SOURCE [AND <pred>] "
                    "THEN DELETE | UPDATE SET c = expr, ..."
                )
            pred = nm.group("pred")
            cond = None
            if pred is not None:
                if re.search(
                    rf"\b{re.escape(m.group('salias'))}\.", pred,
                    re.IGNORECASE,
                ):
                    raise ValueError(
                        f"NOT MATCHED BY SOURCE predicate {pred!r} "
                        "references the source alias; by definition "
                        "these rows have no source match — use target "
                        "columns"
                    )
                cond = re.sub(
                    rf"\b{re.escape(m.group('talias'))}\.", "", pred,
                    flags=re.IGNORECASE,
                )
            if nm.group("act").upper() == "DELETE":
                nmbs_clauses.append(("delete", cond))
            else:
                assigns: dict[str, str] = {}
                for part in _split_top_level(nm.group("sets")):
                    am = re.match(
                        r"^\s*(?:\w+\.)?([\w`]+)\s*=\s*(.+?)\s*$",
                        part,
                    )
                    if not am:
                        raise ValueError(
                            f"cannot parse NMBS assignment {part!r}"
                        )
                    assigns[am.group(1).strip("`")] = re.sub(
                        rf"\b{re.escape(m.group('talias'))}\.", "",
                        am.group(2), flags=re.IGNORECASE,
                    )
                nmbs_clauses.append(("update", cond, assigns))
        if len(nmbs_clauses) == 1:
            # single clause: the legacy params (back-compat spelling)
            cl = nmbs_clauses[0]
            nmbs_kwargs["not_matched_by_source"] = cl[0]
            if cl[1] is not None:
                nmbs_kwargs["not_matched_by_source_condition"] = cl[1]
            if cl[0] == "update":
                nmbs_kwargs["not_matched_by_source_set"] = cl[2]
        else:
            nmbs_kwargs["not_matched_by_source_clauses"] = nmbs_clauses
    cdc = re.match(
        r"^WHEN MATCHED AND (?P<pred>.+?) THEN DELETE\s+"
        r"WHEN MATCHED THEN UPDATE SET \*\s+"
        r"WHEN NOT MATCHED THEN INSERT \*$",
        clauses,
        re.IGNORECASE,
    )
    up = clauses.upper()
    if up == "WHEN MATCHED THEN DELETE":
        # the reference's template (icberg/iceberg_tables.py:46-49):
        # target rows matching the batch's keys are deleted; the caller
        # appends the deduped batch afterwards
        empty = src.limit(0)
        target.upsert(
            empty, keys=keys, delete_keys=src.select(*keys),
            **nmbs_kwargs,
        )
    elif up == (
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    ):
        tcols = target.read(spark).columns
        if all(c in src.columns for c in tcols):
            src = src.select(*tcols)  # drop source-only routing columns
        target.upsert(src, keys=keys, **nmbs_kwargs)
    elif cdc:
        # the full CDC shape delta-spark users write: a source-side
        # predicate (e.g. s.Op = 'D') routes rows to DELETE, the rest
        # upsert. The predicate must reference only the source alias —
        # it evaluates on the batch, never rescanning the target.
        pred = cdc.group("pred")
        if re.search(
            rf"\b{re.escape(m.group('talias'))}\.", pred, re.IGNORECASE
        ):
            raise ValueError(
                f"MERGE delete predicate {pred!r} references the target "
                "alias; only source-side predicates are supported"
            )
        pred_expr = re.sub(
            rf"\b{re.escape(m.group('salias'))}\.",
            "",
            pred,
            flags=re.IGNORECASE,
        )
        from pyspark.sql import functions as F

        dels = src.where(F.expr(pred_expr))
        keep = src.where(~F.coalesce(F.expr(pred_expr), F.lit(False)))
        # UPDATE SET * / INSERT * write the TARGET's columns: project
        # away source-only routing columns (Op etc.), loud if a target
        # column is missing from the batch
        tcols = target.read(spark).columns
        missing = [c for c in tcols if c not in keep.columns]
        if missing:
            raise ValueError(
                f"MERGE source lacks target column(s) {missing} "
                "required by UPDATE SET * / INSERT *"
            )
        target.upsert(
            keep.select(*tcols), keys=keys,
            delete_keys=dels.select(*keys), **nmbs_kwargs,
        )
    else:
        # the general chain: any number of conditional WHEN MATCHED
        # UPDATE/DELETE clauses (first-match-wins) + an optional
        # [conditional] WHEN NOT MATCHED THEN INSERT * or INSERT
        # (cols) VALUES (exprs) — delta-spark's full matched/not-
        # matched grammar. Unlike the fast shapes
        # above (which never scan the target), this leg reads the
        # matched rows — exactly delta-spark's cost for it.
        parsed = _parse_clause_chain(
            clauses, m.group("talias"), m.group("salias")
        )
        if parsed is None:
            raise ValueError(
                f"unsupported MERGE clause shape {clauses!r}: supported "
                "are 'WHEN MATCHED THEN DELETE', 'WHEN MATCHED THEN "
                "UPDATE SET * WHEN NOT MATCHED THEN INSERT *', the CDC "
                "shape 'WHEN MATCHED AND <src pred> THEN DELETE WHEN "
                "MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT "
                "*', any chain of 'WHEN MATCHED [AND p] THEN UPDATE SET "
                "(*|c = expr, ...) | DELETE' clauses plus a chain of "
                "'WHEN NOT MATCHED [AND p] THEN INSERT * | (cols) "
                "VALUES (exprs)' clauses, each "
                "optionally followed by a chain of 'WHEN NOT MATCHED "
                "BY SOURCE [AND <pred>] THEN DELETE | UPDATE SET "
                "c = expr, ...' clauses"
            )
        mcs, ins_flag, ins_cond, ins_set, nm_clauses = parsed
        target.upsert(
            src,
            keys=keys,
            matched_clauses=mcs,
            not_matched_insert=ins_flag,
            not_matched_condition=ins_cond,
            not_matched_set=ins_set,
            not_matched_clauses=nm_clauses,
            **nmbs_kwargs,
        )


def _parse_props(raw: str | None) -> dict[str, str]:
    """TBLPROPERTIES body: 'k'='v' pairs, comma-separated. Keys keep
    their spelling (delta property keys are canonical-cased; the
    writer matches protocol-bearing ones case-insensitively)."""
    props: dict[str, str] = {}
    for k, v in re.findall(r"'([^']*)'\s*=\s*'([^']*)'", raw or ""):
        props[k] = v
    return props


def _run_create_external(spark: SparkSession, m: re.Match) -> None:
    """The reference's Athena registration DDL, executed as text
    (delta/delta_tables.py:41-47): bind the layout at LOCATION under the
    statement's name. ``table_type`` picks the protocol; absent, the
    on-disk layout decides (Athena's crawler behavior). IF NOT EXISTS
    makes a same-name re-run a no-op, exactly like the reference
    re-running its bootstrap."""
    from aws_glue_data_lake_spark.catalog import bind_table, binding

    name = m.group("name").strip("`")
    props = {k.lower(): v for k, v in _parse_props(m.group("props")).items()}
    fmt = props.get("table_type", "").lower() or None
    if m.group("ine") and binding(spark, name) is not None:
        return
    bind_table(spark, name, m.group("path"), fmt, replace=False)


def _run_update(
    spark: SparkSession, m: re.Match, tables: dict | None
) -> None:
    target = _resolve(m.group("target"), tables, spark)
    if target is None:
        raise ValueError(
            f"UPDATE target {m.group('target')!r} is not a known table "
            "(bind it in the catalog, pass tables=, or use fmt.`/path`)"
        )
    assignments: dict[str, str] = {}
    # split SET list on top-level commas, string-literal-aware
    for part in _split_top_level(m.group("sets")):
        am = re.match(r"^\s*`?(\w+)`?\s*=\s*(.+?)\s*$", part, re.DOTALL)
        if not am:
            raise ValueError(f"unsupported UPDATE assignment {part!r}")
        assignments[am.group(1)] = am.group(2)
    target.update_where(spark, m.group("pred") or "true", assignments)


def _run_insert(
    spark: SparkSession, m: re.Match, tables: dict | None
) -> None:
    target = _resolve(m.group("target"), tables, spark)
    if target is None:
        raise ValueError(
            f"INSERT target {m.group('target')!r} is not a known table "
            "(bind it in the catalog, pass tables=, or use fmt.`/path`)"
        )
    # the body (SELECT/VALUES/WITH/TABLE) is plain Spark SQL — run it
    # through sql() so facade references inside it resolve too
    batch = sql(spark, m.group("body"), tables)
    tcols = target.read(spark).columns
    missing = [c for c in tcols if c not in batch.columns]
    if missing and len(batch.columns) == len(tcols):
        # positional VALUES form: map by position like INSERT does
        batch = batch.toDF(*tcols)
    elif missing:
        raise ValueError(
            f"INSERT source lacks target column(s) {missing}"
        )
    target.append(batch.select(*tcols))


def _run_delete(
    spark: SparkSession, m: re.Match, tables: dict | None
) -> None:
    target = _resolve(m.group("target"), tables, spark)
    if target is None:
        raise ValueError(
            f"DELETE target {m.group('target')!r} is not a known table "
            "(bind it in the catalog, pass tables=, or use fmt.`/path`)"
        )
    target.delete_where(spark, m.group("pred"))


def _require(m: re.Match, tables: dict | None, spark, what: str) -> Table:
    t = _resolve(m.group("target"), tables, spark)
    if t is None:
        raise ValueError(
            f"{what} target {m.group('target')!r} is not a known table "
            "(bind it in the catalog, pass tables=, or use fmt.`/path`)"
        )
    return t


def _run_create_using(
    spark: SparkSession, m: re.Match, tables: dict | None
) -> None:
    """CREATE TABLE <name> USING <fmt> [PARTITIONED BY (...)]
    [LOCATION '<path>'] [AS SELECT ...]: create the format table (CTAS
    when a body is given; an empty declared table needs a body — no
    column-list form here) and BIND the name in the session catalog.
    Without LOCATION the data lands under the session warehouse dir /
    <name> ("managed" placement; DROP still leaves the files, external
    semantics — documented deviation)."""
    import os as _os

    from aws_glue_data_lake_spark.catalog import bind_table, binding

    name = m.group("name").strip("`")
    fmt = m.group("fmt").lower()
    body = m.group("body")
    if body is None:
        raise ValueError(
            "CREATE TABLE ... USING needs AS SELECT (column-list "
            "declarations without data are not supported here)"
        )
    ine = re.match(r"^\s*CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS", m.string,
                   re.IGNORECASE)
    if binding(spark, name) is not None:
        if ine:
            return
        raise FileExistsError(
            f"catalog already has a table named {name!r} "
            "(CREATE TABLE IF NOT EXISTS to tolerate)"
        )
    path = m.group("path")
    if path is None:
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        path = _os.path.join(warehouse, *name.lower().split("."))
    df = sql(spark, body, tables)
    pby = [
        c.strip().strip("`")
        for c in (m.group("pby") or "").split(",")
        if c.strip()
    ]
    cby = [
        c.strip().strip("`")
        for c in (m.group("cby") or "").split(",")
        if c.strip()
    ]
    open_table(_os.path.abspath(path), fmt).create(
        df, partition_by=pby, cluster_by=cby
    )
    bind_table(spark, name, path, fmt)


def _run_create_clone(
    spark: SparkSession, m: re.Match, tables: dict | None
) -> None:
    """CREATE TABLE <tgt> SHALLOW CLONE <src> [VERSION AS OF n |
    TIMESTAMP AS OF ms]: resolve the source through the standard chain
    (tables= mapping, fmt.`/path` literal, bare path, catalog binding)
    and fork it metadata-only at the target. The target is a
    fmt.`/path` literal, a bare path, or a catalog name (placed under
    the session warehouse dir and bound, like CREATE TABLE ... USING);
    its format always follows the source."""
    import os as _os

    from aws_glue_data_lake_spark.catalog import bind_table, binding

    src = _resolve(m.group("src"), tables, spark)
    if src is None:
        raise ValueError(
            f"SHALLOW CLONE source {m.group('src')!r} is not a known "
            "table (bind it in the catalog, pass tables=, or use the "
            "fmt.`/path` literal form)"
        )
    version = timestamp_ms = None
    if m.group("kind"):
        val = m.group("val").strip("'")
        if m.group("kind").upper() == "VERSION":
            version = int(val)
        else:
            timestamp_ms = int(val)
    tgt = m.group("name").strip()
    ine = re.match(
        r"^\s*CREATE\s+TABLE\s+IF\s+NOT\s+EXISTS", m.string, re.IGNORECASE
    )
    pm = _PATH_LITERAL_RE.match(tgt)
    if pm:
        if pm.group("fmt").lower() != src.format:
            raise ValueError(
                f"SHALLOW CLONE target format {pm.group('fmt')!r} must "
                f"match the source's ({src.format!r})"
            )
        dest, bind_name = pm.group("path"), None
    elif "/" in tgt.strip("`"):
        dest, bind_name = tgt.strip("`"), None
    else:
        bind_name = tgt.strip("`")
        if binding(spark, bind_name) is not None:
            if ine:
                return
            raise FileExistsError(
                f"catalog already has a table named {bind_name!r} "
                "(CREATE TABLE IF NOT EXISTS to tolerate)"
            )
        warehouse = spark.conf.get(
            "spark.sql.warehouse.dir", "spark-warehouse"
        ).removeprefix("file:")
        dest = _os.path.join(warehouse, *bind_name.lower().split("."))
    if ine and open_table(dest, src.format).exists():
        return
    src.clone_to(
        _os.path.abspath(dest), version=version, timestamp_ms=timestamp_ms
    )
    if bind_name:
        bind_table(spark, bind_name, dest, src.format)


def _parse_partition_transform(expr: str) -> tuple[str, str]:
    """Iceberg SQL transform expression -> (source column, spec
    transform string): bucket(N, col), truncate(N, col),
    years/months/days/hours(col) (singular accepted), or a bare
    column (identity)."""
    m = re.match(
        r"^(bucket|truncate)\s*\(\s*(\d+)\s*,\s*`?([\w]+)`?\s*\)$",
        expr,
        re.IGNORECASE,
    )
    if m:
        return m.group(3), f"{m.group(1).lower()}[{m.group(2)}]"
    m = re.match(
        r"^(years?|months?|days?|hours?)\s*\(\s*`?([\w]+)`?\s*\)$",
        expr,
        re.IGNORECASE,
    )
    if m:
        return m.group(2), m.group(1).lower().rstrip("s")
    m = re.match(r"^`?([\w]+)`?$", expr)
    if m:
        return m.group(1), "identity"
    raise ValueError(
        f"cannot parse partition transform {expr!r}: expected "
        "bucket(N, col), truncate(N, col), years|months|days|hours"
        "(col) or a bare column"
    )


def _split_top_level(s: str) -> list[str]:
    """Split on commas OUTSIDE parentheses and OUTSIDE single-quoted
    string literals (assignment lists whose expressions may hold
    function calls or quoted text like ``concat(v, ')')`` — SQL
    escapes a quote inside a literal by doubling it, which this scan
    sees as two adjacent literals, same net effect)."""
    out: list[str] = []
    depth, in_str, cur = 0, False, []
    for ch in s:
        if in_str:
            if ch == "'":
                in_str = False
            cur.append(ch)
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def _parens_balanced(s: str) -> bool:
    """Balanced parens check that ignores parens inside single-quoted
    SQL literals ('' escaping reduces to two adjacent literals)."""
    depth, in_str = 0, False
    for ch in s:
        if in_str:
            if ch == "'":
                in_str = False
            continue
        if ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth < 0:
                return False
    return depth == 0 and not in_str


def _run_alter(
    spark: SparkSession, m: re.Match, tables: dict | None
) -> None:
    t = _require(m, tables, spark, "ALTER TABLE")
    action = re.sub(r"\s+", " ", m.group("action")).strip()
    am = re.match(
        r"^ADD CONSTRAINT (\w+) CHECK \((.+)\)$", action, re.IGNORECASE
    )
    if am:
        t.set_constraint(am.group(1), am.group(2), spark=spark)
        return
    am = re.match(r"^DROP CONSTRAINT (\w+)$", action, re.IGNORECASE)
    if am:
        t.drop_constraint(am.group(1))
        return
    am = re.match(
        r"^ALTER COLUMN ([\w`]+) SET DEFAULT (.+)$", action,
        re.IGNORECASE,
    )
    if am:
        t.set_column_default(am.group(1).strip("`"), am.group(2).strip())
        return
    am = re.match(
        r"^ADD PARTITION FIELD\s+(?P<expr>.+?)"
        r"(?:\s+AS\s+(?P<name>[\w`]+))?$",
        action,
        re.IGNORECASE,
    )
    if am:
        source, transform = _parse_partition_transform(
            am.group("expr").strip()
        )
        t.add_partition_field(
            source,
            transform=transform,
            name=(am.group("name") or "").strip("`") or None,
        )
        return
    am = re.match(
        r"^DROP PARTITION FIELD\s+([\w`]+)$", action, re.IGNORECASE
    )
    if am:
        t.remove_partition_field(am.group(1).strip("`"))
        return
    am = re.match(
        r"^WRITE ORDERED BY\s*\(?\s*(?P<cols>[\w`,\s]+?)\s*\)?$",
        action,
        re.IGNORECASE,
    )
    if am:
        cols, desc = [], []
        for part in am.group("cols").split(","):
            toks = part.split()
            if not toks:
                continue
            c = toks[0].strip("`")
            cols.append(c)
            if len(toks) > 1 and toks[1].upper() == "DESC":
                desc.append(c)
            elif len(toks) > 1 and toks[1].upper() != "ASC":
                raise ValueError(
                    f"WRITE ORDERED BY: cannot parse {part.strip()!r}"
                )
        t.set_sort_order(cols, descending=desc)
        return
    am = re.match(
        r"^CLUSTER BY (?:NONE|\(\s*(?P<cols>[\w`,\s]+?)\s*\))$",
        action,
        re.IGNORECASE,
    )
    if am:
        t.set_cluster_by(
            [
                c.strip().strip("`")
                for c in (am.group("cols") or "").split(",")
                if c.strip()
            ]
        )
        return
    am = re.match(
        r"^ALTER COLUMN ([\w`.]+) TYPE (.+)$", action, re.IGNORECASE
    )
    if am:
        t.widen_column_type(am.group(1).strip("`"), am.group(2).strip())
        return
    am = re.match(
        r"^RENAME COLUMN ([\w`.]+) TO ([\w`]+)$", action, re.IGNORECASE
    )
    if am:
        t.rename_column(am.group(1).strip("`"), am.group(2).strip("`"))
        return
    am = re.match(
        r"^DROP COLUMNS? \(?\s*([\w`.]+)\s*\)?$", action, re.IGNORECASE
    )
    if am:
        t.drop_column(am.group(1).strip("`"))
        return
    am = re.match(r"^ADD COLUMNS?\s+(.+)$", action, re.IGNORECASE)
    if am:
        # parameterized types carry their own parens — DECIMAL(10,2),
        # VARCHAR(32) — so the body is captured greedily and ONE outer
        # balanced pair (the 'ADD COLUMNS (…)' wrapper) is stripped
        # explicitly, never by excluding ')' from the type capture
        body = am.group(1).strip()
        if (
            body.startswith("(")
            and body.endswith(")")
            and _parens_balanced(body[1:-1])
        ):
            body = body[1:-1].strip()
        cm_ = re.match(r"^([\w`.]+)\s+(.+)$", body)
        if not cm_:
            raise ValueError(
                f"unsupported ADD COLUMN body {body!r}: expected "
                "'<col> <type> [DEFAULT <expr>]'"
            )
        am = cm_
        type_ddl = am.group(2).strip()
        dm = re.match(
            r"^(.*?)\s+DEFAULT\s+(.+)$", type_ddl, re.IGNORECASE
        )
        if dm:
            # surfaces the protocol's targeted refusal
            t.add_column(
                am.group(1).strip("`"), dm.group(1).strip(),
                default=dm.group(2).strip(),
            )
            return
        t.add_column(am.group(1).strip("`"), type_ddl)
        return
    am = re.match(
        r"^SET TBLPROPERTIES \(\s*(.+?)\s*\)$", action, re.IGNORECASE
    )
    if am:
        props = _parse_props(am.group(1))
        if not props:
            raise ValueError(
                f"no 'k'='v' pairs in TBLPROPERTIES {am.group(1)!r}"
            )
        for k, v in props.items():
            t.set_property(k, v)
        return
    raise ValueError(
        f"unsupported ALTER TABLE action {action!r}: supported are "
        "ADD CONSTRAINT <name> CHECK (<expr>), DROP CONSTRAINT <name>, "
        "ALTER COLUMN <col> SET DEFAULT <expr>, "
        "ALTER COLUMN <col> TYPE <type>, "
        "ADD COLUMN <col> <type>, RENAME COLUMN <a> TO <b>, "
        "DROP COLUMN <col>, CLUSTER BY (<cols>) | NONE, "
        "SET TBLPROPERTIES ('k'='v', ...)"
    )


def sql(
    spark: SparkSession, statement: str, tables: dict | None = None
) -> DataFrame | None:
    """Execute one SQL statement against facade tables (module doc for
    the supported surface). DML/DDL/maintenance statements (MERGE /
    UPDATE / DELETE / INSERT / CREATE EXTERNAL TABLE / ALTER TABLE /
    OPTIMIZE / VACUUM) return None (like ``spark.sql``'s empty result
    for DML against a path table); SELECT and DESCRIBE HISTORY return
    the DataFrame of the rewritten query."""
    m = _OPTIMIZE_RE.match(statement)
    if m:
        zcols = [
            c.strip().strip("`")
            for c in (m.group("zcols") or "").split(",")
            if c.strip()
        ]
        _require(m, tables, spark, "OPTIMIZE").compact(
            spark, zorder_by=zcols
        )
        return None
    m = _TRUNCATE_RE.match(statement)
    if m:
        _require(m, tables, spark, "TRUNCATE").truncate(spark)
        return None
    m = _REORG_RE.match(statement)
    if m:
        _require(m, tables, spark, "REORG").reorg_purge(spark)
        return None
    m = _VACUUM_RE.match(statement)
    if m:
        tbl = _require(m, tables, spark, "VACUUM")
        dry = bool(m.group("dry"))
        if (m.group("unit") or "").upper() == "HOURS":
            # Delta SQL's time-based retention: hours map onto trailing
            # versions from commit timestamps (Table._keep_for_hours) —
            # conservative vs delta-spark's file-mtime rule, never
            # deleting a file a retained version still references
            paths = tbl.vacuum(hours=float(m.group("n")), dry_run=dry)
        else:
            paths = tbl.vacuum(
                keep=int(m.group("n")) if m.group("n") else 1,
                dry_run=dry,
            )
        if dry:  # delta-spark's DRY RUN returns the path result set
            return local_df(spark, [(p,) for p in paths], "path string")
        return None
    m = _RESTORE_RE.match(statement)
    if m:
        tbl = _require(m, tables, spark, "RESTORE")
        val = m.group("val").strip("'")
        if m.group("kind").upper() == "TIMESTAMP":
            if tbl.format != "delta":
                raise ValueError(
                    "RESTORE ... TIMESTAMP AS OF is a Delta capability"
                    " (iceberg/lake restore by version/snapshot-id)"
                )
            import datetime as _dt

            ts_ms = int(
                _dt.datetime.fromisoformat(val).timestamp() * 1000
            )
            ver = tbl._delta_reader().version_at_timestamp(ts_ms)
        else:
            ver = int(val)
        tbl.restore(ver, spark=spark)
        return None
    m = _SHOW_TBLPROPS_RE.match(statement)
    if m:
        props = _require(m, tables, spark, "SHOW TBLPROPERTIES").properties()
        if m.group("key") is not None:
            k = m.group("key")
            props = {k: props.get(k)}
        return local_df(
            spark, sorted(props.items()), "key string, value string"
        )
    m = _DESCRIBE_HISTORY_RE.match(statement)
    if m:
        return _require(m, tables, spark, "DESCRIBE HISTORY").snapshots(
            spark
        )
    m = _DESCRIBE_DETAIL_RE.match(statement)
    if m:
        return _require(m, tables, spark, "DESCRIBE DETAIL").detail(spark)
    m = _CREATE_CLONE_RE.match(statement)
    if m:
        _run_create_clone(spark, m, tables)
        return None
    m = _CREATE_USING_RE.match(statement)
    if m and m.group("fmt"):
        _run_create_using(spark, m, tables)
        return None
    m = _ALTER_RE.match(statement)
    if m and not _CREATE_EXTERNAL_RE.match(statement):
        _run_alter(spark, m, tables)
        return None
    m = _CREATE_EXTERNAL_RE.match(statement)
    if m:
        _run_create_external(spark, m)
        return None
    m = _MERGE_RE.match(statement)
    if m:
        _run_merge(spark, m, tables)
        return None
    m = _INSERT_RE.match(statement)
    if m:
        _run_insert(spark, m, tables)
        return None
    m = _UPDATE_RE.match(statement)
    if m:
        _run_update(spark, m, tables)
        return None
    m = _DELETE_RE.match(statement)
    if m:
        _run_delete(spark, m, tables)
        return None

    # SELECT path: materialize time-travel and facade references as
    # temp views, leave the rest of the statement to Spark SQL
    rewritten = statement

    def tt_sub(match: re.Match) -> str:
        t = _resolve(match.group("ref"), tables, spark)
        if t is None:
            return match.group(0)
        kind = match.group("kind").upper()
        val = match.group("val").strip("'")
        df = (
            t.read(spark, version=int(val))
            if kind == "VERSION"
            else t.read(spark, timestamp_ms=int(val))
        )
        view = f"__sqlfront_{_uuid.uuid4().hex}"
        df.createOrReplaceTempView(view)
        return view

    def tc_sub(match: re.Match) -> str:
        # delta-spark's table_changes('<t>', start[, end]) TVF: resolve
        # the quoted reference through the same chain and register the
        # facade CDF read as a temp view
        t = _resolve(match.group("ref"), tables, spark)
        if t is None:
            raise ValueError(
                f"table_changes target {match.group('ref')!r} is not a "
                "known table (bind it in the catalog, pass tables=, or "
                "use a path)"
            )
        kw: dict = {"starting_version": int(match.group("lo"))}
        if match.group("hi") is not None:
            kw["ending_version"] = int(match.group("hi"))
        view = f"__sqlfront_{_uuid.uuid4().hex}"
        t.changes(spark, **kw).createOrReplaceTempView(view)
        return view

    rewritten = _TABLE_CHANGES_RE.sub(tc_sub, rewritten)
    rewritten = _TIME_TRAVEL_RE.sub(tt_sub, rewritten)
    for name, t in (tables or {}).items():
        if re.search(rf"(?<![\w.`]){re.escape(name)}(?![\w.`])", rewritten):
            handle = t if isinstance(t, Table) else open_table(str(t))
            view = f"__sqlfront_{_uuid.uuid4().hex}"
            handle.read(spark).createOrReplaceTempView(view)
            rewritten = re.sub(
                rf"(?<![\w.`]){re.escape(name)}(?![\w.`])", view, rewritten
            )
    def lit_sub(match: re.Match) -> str:
        handle = open_table(match.group("path"), match.group("fmt").lower())
        view = f"__sqlfront_{_uuid.uuid4().hex}"
        handle.read(spark).createOrReplaceTempView(view)
        return view

    rewritten = re.sub(
        r"(?P<fmt>delta|iceberg|lake)\.`(?P<path>[^`]+)`",
        lit_sub,
        rewritten,
        flags=re.IGNORECASE,
    )

    # catalog-bound names in FROM/JOIN positions read through the facade
    # (spark.sql against the raw binding entry would scan ALL parquet
    # under the location, ignoring the transaction log — superset rows)
    def from_sub(match: re.Match) -> str:
        ref = match.group("ref").strip("`")
        from aws_glue_data_lake_spark.catalog import binding

        b = binding(spark, ref)
        if b is None:
            return match.group(0)
        view = f"__sqlfront_{_uuid.uuid4().hex}"
        open_table(*b).read(spark).createOrReplaceTempView(view)
        return f"{match.group('kw')} {view}"

    rewritten = _FROM_REF_RE.sub(from_sub, rewritten)
    return spark.sql(rewritten)
