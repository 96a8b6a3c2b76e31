"""Generate the ~10× scale-stress slab (VERDICT r5 #4): local fixtures
an order of magnitude past the driver's largest (sf0.1), used to convert
"designed for 100 TB" into measured evidence for the cap/state machinery.

The slab derives from /root/testdata/sf0.1 by 10-way replication with
per-replica transforms chosen so the WORKLOAD SCALES LINEARLY — each
replica keeps the base fixture's internal structure but does not
cross-match other replicas (otherwise replication itself would inject a
quadratic pair blow-up and the "no superlinear time" check would measure
the data, not the engine):

- events: event_id/user_id shifted per replica (10× users at the same
  per-user density — join/agg state grows linearly, per-key work stays
  constant), ts jittered by r seconds to avoid exact-collision artifacts.
- documents: doc_id shifted; every TOKEN prefixed with the replica tag for
  r>0, so shingle/minhash/simhash spaces are disjoint across replicas and
  near-dup clusters stay base-sized (10× clusters, not 10×-bigger ones).
- embeddings: vec_id shifted; coordinate signs flipped by the bit pattern
  of r over (i mod 4), which preserves all within-replica cosines (both
  sides flip together) while pointing replicas into different orthants so
  cross-replica banding collisions stay rare.

Output: .slab/x10/{events,documents,embeddings}.parquet (gitignored) plus
the untouched relational tables symlinked for loader compatibility.

Usage: python scripts/gen_scale_slab.py [--base /root/testdata/sf0.1]
       [--out .slab/x10] [--replicas 10]
"""

from __future__ import annotations

import argparse
import os

import duckdb

REL_TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".slab", "x10"),
    )
    ap.add_argument("--replicas", type=int, default=10)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    R = args.replicas

    def src(name: str) -> str:
        return os.path.join(args.base, f"{name}.parquet")

    def dst(name: str) -> str:
        return os.path.join(args.out, f"{name}.parquet")

    # --- events: shift ids/users per replica, jitter ts by r seconds ----
    emax, umax = con.execute(
        f"SELECT MAX(event_id), MAX(user_id) FROM read_parquet('{src('events')}')"
    ).fetchone()
    con.execute(f"""
COPY (
  SELECT event_id + r * {emax + 1} AS event_id,
         ts + to_seconds(r) AS ts,
         user_id + r * {umax + 1} AS user_id,
         event_type, value, props
  FROM read_parquet('{src('events')}'),
       UNNEST(generate_series(0, {R - 1})) AS u(r)
) TO '{dst('events')}' (FORMAT parquet)
""")

    # --- documents: disjoint token space per replica ---------------------
    dmax = con.execute(
        f"SELECT MAX(doc_id) FROM read_parquet('{src('documents')}')"
    ).fetchone()[0]
    con.execute(f"""
COPY (
  SELECT doc_id + r * {dmax + 1} AS doc_id,
         CASE WHEN r = 0 THEN text
              ELSE regexp_replace(text, '(\\S+)', 'r' || r || '\\1', 'g')
         END AS text,
         lang, source,
         n_chars
  FROM read_parquet('{src('documents')}'),
       UNNEST(generate_series(0, {R - 1})) AS u(r)
) TO '{dst('documents')}' (FORMAT parquet)
""")

    # --- embeddings: orthant rotation per replica ------------------------
    vmax, dim = con.execute(
        f"SELECT MAX(vec_id), MAX(LEN(embedding)) "
        f"FROM read_parquet('{src('embeddings')}')"
    ).fetchone()
    con.execute(f"""
COPY (
  SELECT vec_id + r * {vmax + 1} AS vec_id,
         CAST(list_transform(generate_series(1, {dim}),
              i -> embedding[i] * CASE WHEN ((r >> ((i - 1) % 4)) & 1) = 1
                                       THEN -1 ELSE 1 END)
              AS FLOAT[]) AS embedding,
         label
  FROM read_parquet('{src('embeddings')}'),
       UNNEST(generate_series(0, {R - 1})) AS u(r)
) TO '{dst('embeddings')}' (FORMAT parquet)
""")

    # --- relational tables: pass through unchanged (loader compat) -------
    for name in REL_TABLES:
        target = dst(name)
        if not os.path.exists(target):
            os.symlink(src(name), target)

    for name in ("events", "documents", "embeddings"):
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst(name)}')"
        ).fetchone()[0]
        print(f"{name}: {n} rows -> {dst(name)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
