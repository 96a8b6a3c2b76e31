"""Property-based check of the lake layer: any sequence of upsert /
delete / append batches over a small key space must leave the table equal
to a trivial in-memory dict model, every intermediate snapshot must stay
readable (time travel), and file counts must stay finite. Spark makes each
example expensive, so the example budget is small but each sequence is
deep — the state space coverage comes from sequence depth, not volume."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from aws_glue_data_lake_spark.lake import LakeTable

KEYS = st.integers(min_value=0, max_value=19)

# an op is ("upsert", {k: v}) | ("delete", [k]) | ("append", {k: v})
OPS = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.dictionaries(KEYS, st.integers(-100, 100), min_size=1, max_size=4),
        ),
        st.tuples(st.just("delete"), st.lists(KEYS, min_size=1, max_size=3)),
    ),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(ops=OPS)
def test_upsert_sequences_match_dict_model(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("lake_prop")
    t = LakeTable(str(tmp / "t"))
    base = {k: k * 10 for k in range(10)}
    t.create(
        spark.createDataFrame(list(base.items()), "k long, v long")
        .repartitionByRange(2, "k"),
        stat_cols=["k"],
    )
    model = dict(base)
    for kind, payload in ops:
        if kind == "upsert":
            batch = spark.createDataFrame(
                list(payload.items()), "k long, v long"
            )
            t.upsert(batch, keys=["k"])
            model.update(payload)
        else:
            kill = spark.createDataFrame([(k,) for k in payload], "k long")
            empty = spark.createDataFrame([], "k long, v long")
            t.upsert(empty, keys=["k"], delete_keys=kill)
            for k in payload:
                model.pop(k, None)
        got = {r["k"]: r["v"] for r in t.read(spark).collect()}
        assert got == model
    # every snapshot stays readable; v1 is still the base
    v1 = {r["k"]: r["v"] for r in t.read(spark, version=1).collect()}
    assert v1 == base
    assert t.current_version() == 1 + len(ops)
    # file count stays bounded: each op adds at most one write's worth of
    # part files (<= shuffle partitions — this is exactly why compact()
    # exists for long-lived tables)
    per_write = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert len(t.snapshot().files) <= 2 + per_write * len(ops)


def test_model_check_smoke(spark, tmp_path):
    """Deterministic single case mirroring the property, so a hypothesis
    environment problem never silently skips all model coverage."""
    t = LakeTable(str(tmp_path / "t"))
    t.create(spark.createDataFrame([(1, 10), (2, 20)], "k long, v long"),
             stat_cols=["k"])
    t.upsert(spark.createDataFrame([(2, -2), (3, 30)], "k long, v long"),
             keys=["k"])
    kill = spark.createDataFrame([(1,)], "k long")
    t.upsert(spark.createDataFrame([], "k long, v long"), keys=["k"],
             delete_keys=kill)
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert got == {2: -2, 3: 30}
    assert t.read(spark, version=1).count() == 2


# ---------------------------------------------------------------------------
# Legacy-manifest upgrade under ≥3 INTERLEAVED stream writers (VERDICT r4
# item 7): a chain written before the cumulative txns map existed is
# "legacy-ified" at a random point mid-stream (txns stripped from every
# manifest so far, leaving only per-commit txn records), then more commits
# land. The first post-legacy commit must fold EVERY writer's history into
# the map — on the pre-62f9994 code (seed from chain tip only) any writer
# not at the tip loses its replay-dedup state and this test's replay phase
# re-appends, breaking both the txns assertion and the exactly-once row
# count.
# ---------------------------------------------------------------------------
import json
import os


def _strip_txns_maps(t):
    for v in t._manifest_versions():
        mpath = os.path.join(t._manifests, f"v{v}.json")
        with open(mpath) as f:
            m = json.load(f)
        m.pop("txns", None)
        with open(mpath, "w") as f:
            json.dump(m, f)


_WRITER_BATCHES = st.lists(
    st.lists(st.integers(0, 9), unique=True, min_size=1, max_size=3).map(sorted),
    min_size=3,
    max_size=3,
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(per_writer=_WRITER_BATCHES, data=st.data())
def test_legacy_upgrade_keeps_three_interleaved_writers(
    spark, tmp_path_factory, per_writer, data
):
    # Random interleaving that preserves each writer's batch order (stream
    # writers commit their own batches in order; interleaving across
    # writers is arbitrary).
    slots = [w for w, batches in enumerate(per_writer) for _ in batches]
    order = data.draw(st.permutations(slots))
    commits = []
    cursor = [0, 0, 0]
    for w in order:
        commits.append((w, per_writer[w][cursor[w]]))
        cursor[w] += 1
    # Legacy-ify after a random prefix (≥1 stream commit so there is
    # history to fold, ≤ len-1 so a post-legacy commit triggers upgrade).
    cut = data.draw(st.integers(1, max(1, len(commits) - 1)))

    tmp = tmp_path_factory.mktemp("lake_legacy")
    t = LakeTable(str(tmp / "t"))
    t.create(spark.createDataFrame([(0, 0)], "k long, v long"), stat_cols=["k"])
    expect_last = {}
    n_rows = 1
    for i, (w, b) in enumerate(commits):
        if i == cut:
            _strip_txns_maps(t)
        row = spark.createDataFrame([(100 * (w + 1) + b, i)], "k long, v long")
        snap = t.append_stream_batch(row, writer_id=f"w{w}", batch_id=b)
        assert snap is not None  # per-writer ids are strictly increasing
        expect_last[f"w{w}"] = b
        n_rows += 1
    if cut == len(commits):  # permutation put the strip at the very end
        _strip_txns_maps(t)
    # One new-format commit triggers the one-time upgrade fold.
    t.append(spark.createDataFrame([(999, 999)], "k long, v long"))
    n_rows += 1
    assert t.snapshot().txns == expect_last
    # Exactly-once under replay of EVERY historical micro-batch, in the
    # original interleaved order — the non-tip writers are the regression.
    for w, b in commits:
        assert t.append_stream_batch(
            spark.createDataFrame([(-1, -1)], "k long, v long"),
            writer_id=f"w{w}",
            batch_id=b,
        ) is None, f"replayed (w{w}, {b}) re-appended after legacy upgrade"
    for w in range(3):
        assert t.last_committed_batch(f"w{w}") == per_writer[w][-1]
    assert t.read(spark).count() == n_rows


# ---------------------------------------------------------------------------
# Schema evolution (_evolve) under random schema pairs: for any table
# schema and batch schema drawn from a shared field pool, either a shared
# name changes type (→ ValueError, evolution is never a cast) or the
# merged output is exactly [table fields in table order, then genuinely
# new batch fields in batch order], with table columns keeping their
# types and batch-missing columns present (NULL-filled). Schema-only:
# empty DataFrames keep each example driver-side cheap, so the example
# budget can be bigger than the I/O-bound model check above.
# ---------------------------------------------------------------------------
import pytest

from aws_glue_data_lake_spark.lake import Snapshot

_FIELD_NAMES = ("alpha", "beta", "gamma", "delta", "eps")
_FIELD_TYPES = ("bigint", "string", "double")
_SCHEMAS = st.dictionaries(
    st.sampled_from(_FIELD_NAMES),
    st.sampled_from(_FIELD_TYPES),
    min_size=1,
    max_size=len(_FIELD_NAMES),
)


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(table=_SCHEMAS, batch=_SCHEMAS)
def test_evolve_on_random_schema_pairs(spark, table, batch):
    def ddl(d):
        return ", ".join(f"{n} {t}" for n, t in d.items())

    prev = Snapshot(
        version=1, files=[], schema=ddl(table), op="create", parent=None
    )
    df = spark.createDataFrame([], ddl(batch))
    conflict = any(
        n in table and table[n] != bt for n, bt in batch.items()
    )
    if conflict:
        with pytest.raises(ValueError, match="cannot change column"):
            LakeTable._evolve(df, prev)
        return
    out, schema_ddl = LakeTable._evolve(df, prev)
    got = [(f.name, f.dataType.simpleString()) for f in out.schema.fields]
    want = list(table.items()) + [
        (n, t) for n, t in batch.items() if n not in table
    ]
    assert got == want
    # the committed DDL round-trips to the same shape
    from pyspark.sql.types import StructType

    assert [
        (f.name, f.dataType.simpleString())
        for f in StructType.fromDDL(schema_ddl).fields
    ] == want


def test_incremental_mv_matches_recompute_at_every_commit(spark, tmp_path):
    """MV-maintenance invariant: after EACH commit's delta is merged, the
    MV equals a full recompute over the data ingested so far — not just at
    the end (queries/cdc_queries.py maintain_mv_batch)."""
    from aws_glue_data_lake_spark.queries.cdc_queries import (
        _MV_KEYS,
        maintain_mv_batch,
    )

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    mv = LakeTable(str(tmp_path / "mv"))
    seen = None
    for i in range(4):
        batch = o.where(F.col("o_orderkey") % 4 == i)
        maintain_mv_batch(mv, batch)
        seen = batch if seen is None else seen.unionByName(batch)
        expect = {
            tuple(r)
            for r in seen.groupBy(*_MV_KEYS)
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
                .cast("decimal(28,6)")
                .alias("tp"),
            )
            .collect()
        }
        got = {tuple(r) for r in mv.read(spark).collect()}
        assert got == expect, f"MV diverged from recompute after commit {i}"


# ---------------------------------------------------------------------------
# Manifest DELTA log (VERDICT r6 item 6): commits between checkpoints carry
# only add/remove actions, so any version must reconstruct to exactly the
# state a full-manifest log would hold — across checkpoint boundaries, and
# after vacuum drops the full ancestor a kept delta chain depended on
# (vacuum must materialize). Pure metadata-level ops (no Spark) so the
# example budget can afford deep sequences that cross the checkpoint
# cadence.
# ---------------------------------------------------------------------------
_META_OPS = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(0, 200)),
        st.tuples(st.just("rm"), st.integers(0, 200)),
        st.tuples(st.just("restat"), st.integers(0, 200)),
    ),
    min_size=25,  # > _CHECKPOINT_EVERY: always crosses a checkpoint
    max_size=60,
)


@settings(max_examples=20, deadline=None)
@given(ops=_META_OPS, tag_at=st.integers(2, 20))
def test_delta_manifest_chain_reconstructs_every_version(
    tmp_path_factory, ops, tag_at
):
    import json as _json
    import os as _os

    from aws_glue_data_lake_spark.lake import LakeTable

    t = LakeTable(str(tmp_path_factory.mktemp("mprop") / "t"))
    _os.makedirs(t.path, exist_ok=True)

    def entry(i, stat=0):
        return {"path": f"data/f{i}.parquet", "rows": 1 + stat,
                "stats": {"k": [i, i + stat]}}

    state = {0: entry(0)}
    snap = t._commit(list(state.values()), "k long", "create", None)
    expected = {snap.version: dict(state)}
    for kind, i in ops:
        if kind == "add":
            state[i] = entry(i)
        elif kind == "rm":
            state.pop(i, None)
        else:
            state[i] = entry(i, stat=7)  # changed entry: remove+add
        snap = t._commit(list(state.values()), "k long", kind, snap)
        expected[snap.version] = dict(state)
    # at least one manifest on disk must actually be a delta
    forms = []
    for v in t._manifest_versions():
        with open(_os.path.join(t._manifests, f"v{v}.json")) as f:
            forms.append("files" in _json.load(f))
    assert not all(forms), "no delta manifest was ever written"
    # every version reconstructs to the model
    for v, files in expected.items():
        got = {e["path"]: e for e in t.snapshot(v).files}
        want = {e["path"]: e for e in files.values()}
        assert got == want, f"v{v}"
    # vacuum with a tagged mid-chain version: materialization must keep
    # both the tag and the tip readable after ancestors are dropped
    tag_v = min(tag_at, snap.version)
    t.tag("pin", tag_v)
    t.vacuum(keep_versions=1)
    got_tag = {e["path"]: e for e in t.snapshot(tag_v).files}
    assert got_tag == {e["path"]: e for e in expected[tag_v].values()}
    got_tip = {e["path"]: e for e in t.snapshot().files}
    assert got_tip == {e["path"]: e for e in expected[snap.version].values()}
