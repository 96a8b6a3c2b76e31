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
