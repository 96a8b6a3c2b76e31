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
