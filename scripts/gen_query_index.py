"""Generate QUERY_INDEX.md — the mechanical per-query coverage index
(VERDICT r7 item 8): one row per registered query with its source
location, oracle status, and first/latest driver-green round, so a judge
can diff coverage against CORRECTNESS_r*.json without parsing SURVEY
§2.13's prose tables.

Run:  python scripts/gen_query_index.py   (rewrites QUERY_INDEX.md)

Convention (same as BENCH_FULL.json): the driver writes CORRECTNESS_r{N}
AFTER the round's last commit, so the index is regenerated and committed
as the FIRST commit of the next round — all CORRECTNESS_r*.json files on
disk (committed or not) are folded in at generation time.
"""

from __future__ import annotations

import glob
import inspect
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def green_rounds() -> dict[str, list[int]]:
    out: dict[str, list[int]] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            rows = json.load(open(path))
        except (OSError, ValueError):
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            if (
                row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
                and not row.get("err")
            ):
                out.setdefault(name, []).append(rnd)
    return out


def main() -> int:
    os.environ["SPARK_GRAFT_NO_REORDER"] = "1"
    from aws_glue_data_lake_spark.queries import all_oracles, all_queries

    queries = all_queries()
    oracles = all_oracles()
    greens = green_rounds()

    lines = [
        "# Query index (GENERATED — `python scripts/gen_query_index.py`)",
        "",
        "One row per registered query: source location, DuckDB-oracle",
        "status, and the first/latest round with a fully green driver",
        "CORRECTNESS row (`-` = not yet driver-checked; builder sweeps and",
        "judge spot-checks are tracked in SURVEY §2.13 / VERDICT).",
        "",
        f"Registered: **{len(queries)}** · with oracle: "
        f"**{sum(1 for n in queries if n in oracles)}** · driver-green at "
        f"least once: **{sum(1 for n in queries if n in greens)}**",
        "",
        "| query | source | oracle | first green | latest green |",
        "|---|---|---|---|---|",
    ]
    for name, fn in sorted(queries.items()):
        target = inspect.unwrap(fn)
        try:
            src = os.path.relpath(inspect.getsourcefile(target), REPO)
            line = inspect.getsourcelines(target)[1]
            loc = f"`{src}:{line}`"
        except (TypeError, OSError):
            loc = "`?`"
        g = greens.get(name)
        lines.append(
            f"| `{name}` | {loc} | {'yes' if name in oracles else 'ROWS-ONLY'}"
            f" | {f'r{min(g)}' if g else '-'}"
            f" | {f'r{max(g)}' if g else '-'} |"
        )
    never = sorted(n for n in queries if n not in greens)
    lines += [
        "",
        f"Never driver-checked ({len(never)}): "
        + (", ".join(f"`{n}`" for n in never) if never else "none"),
        "",
    ]
    out_path = os.path.join(REPO, "QUERY_INDEX.md")
    with open(out_path, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_path}: {len(queries)} queries")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
