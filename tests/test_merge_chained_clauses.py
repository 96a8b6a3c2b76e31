"""Chained conditional WHEN MATCHED clauses (VERDICT r13 item 2, +
stretch item 7): delta-spark's ``.whenMatchedUpdate(condition=, set=)
.whenMatchedDelete(condition=)`` chain — first-match-wins per matched
row, unmatched-by-any-clause rows carried unchanged — plus the WHEN
NOT MATCHED leg's full grammar (optional, conditional INSERT *), on
all three writers and the SQL front door (operators/mergeclauses.py,
the generalization of the reference's single whenMatchedDelete,
delta/delta_tables.py:159-160)."""

import pytest
from pyspark.sql import functions as F

from aws_glue_data_lake_spark.operators.mergeclauses import (
    validate_matched_clauses,
)
from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table

CLAUSES = [
    ("delete", "s.price < t.price"),
    ("update", "s.price > 100", {"v": "s.v", "price": "s.price * 0.5"}),
    ("update", "t.v != s.v", None),  # UPDATE SET *
]


def _mk(spark, tmp_path, fmt):
    t = open_table(str(tmp_path / fmt), fmt).create(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
             (4, "d", 40.0)],
            "k long, v string, price double",
        ).repartition(2)
    )
    src = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 200.0), (3, "C", 30.0),
         (9, "I", 90.0)],
        "k long, v string, price double",
    )
    return t, src


def _rows(spark, t):
    return sorted(
        (r["k"], r["v"], r["price"]) for r in t.read(spark).collect()
    )


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_first_match_wins_chain(spark, tmp_path, fmt):
    """k=1: clause 0 (delete) wins though clause 2 also matches.
    k=2: clause 1 column-level update. k=3: clause 2 SET *. k=4:
    unmatched target, carried. k=9: unmatched source, inserted."""
    t, src = _mk(spark, tmp_path, fmt)
    t.upsert(src, keys=["k"], matched_clauses=CLAUSES)
    assert _rows(spark, t) == [
        (2, "B", 100.0), (3, "C", 30.0), (4, "d", 40.0),
        (9, "I", 90.0),
    ]


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_no_clause_fires_carries_matched_rows(spark, tmp_path, fmt):
    """A matched row matching NO clause carries unchanged (delta-spark
    semantics) — unlike the default replace-with-source leg."""
    t, src = _mk(spark, tmp_path, fmt)
    t.upsert(
        src, keys=["k"],
        matched_clauses=[("update", "s.v = 'never'", {"v": "s.v"})],
    )
    assert _rows(spark, t) == [
        (1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
        (4, "d", 40.0), (9, "I", 90.0),
    ]


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_insert_leg_grammar(spark, tmp_path, fmt):
    """not_matched_insert=False drops inserts; not_matched_condition
    gates them on bare source columns."""
    t, src = _mk(spark, tmp_path, fmt)
    t.upsert(
        src, keys=["k"],
        matched_clauses=[("update", None, None)],
        not_matched_insert=False,
    )
    assert [k for k, _, _ in _rows(spark, t)] == [1, 2, 3, 4]
    t.upsert(
        spark.createDataFrame(
            [(50, "yes", 1.0), (51, "no", 2.0)],
            "k long, v string, price double",
        ),
        keys=["k"],
        matched_clauses=[("update", None, None)],
        not_matched_condition="v = 'yes'",
    )
    assert [k for k, _, _ in _rows(spark, t)] == [1, 2, 3, 4, 50]


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_extra_source_columns_are_expression_only(
    spark, tmp_path, fmt
):
    """A routing column (CDC Op flag) may drive conditions via s.<col>
    but never lands in the table."""
    t, _ = _mk(spark, tmp_path, fmt)
    batch = spark.createDataFrame(
        [(1, "X", 11.0, "D"), (2, "Y", 22.0, "U"), (7, "n", 7.0, "I")],
        "k long, v string, price double, op string",
    )
    t.upsert(
        batch, keys=["k"],
        matched_clauses=[
            ("delete", "s.op = 'D'"),
            ("update", "s.op = 'U'", None),
        ],
    )
    assert _rows(spark, t) == [
        (2, "Y", 22.0), (3, "c", 30.0), (4, "d", 40.0), (7, "n", 7.0),
    ]
    assert "op" not in t.read(spark).columns


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_chain_combines_with_nmbs(spark, tmp_path, fmt):
    """All three MERGE legs at once: conditional matched chain +
    conditional insert + NOT MATCHED BY SOURCE delete."""
    t, src = _mk(spark, tmp_path, fmt)
    t.upsert(
        src, keys=["k"],
        matched_clauses=[("update", "s.price > t.price", None)],
        not_matched_condition="price > 50",
        not_matched_by_source="delete",
        not_matched_by_source_condition="k > 3",
    )
    # k=2 updated (200>20); k=1,3 carried (no clause fired); k=4
    # unmatched-by-source and k>3 -> deleted; k=9 inserted (90>50)
    assert _rows(spark, t) == [
        (1, "a", 10.0), (2, "B", 200.0), (3, "c", 30.0),
        (9, "I", 90.0),
    ]


def test_validation_rules(spark, tmp_path):
    t, src = _mk(spark, tmp_path, "delta")
    with pytest.raises(ValueError, match="non-empty"):
        t.upsert(src, keys=["k"], matched_clauses=[])
    with pytest.raises(ValueError, match="unreachable"):
        validate_matched_clauses(
            [("update", None, None), ("delete", "t.k = 1")], ["k"]
        )
    with pytest.raises(ValueError, match="takes no SET"):
        validate_matched_clauses([("delete", None, {"k": "1"})], ["k"])
    with pytest.raises(ValueError, match="unknown"):
        validate_matched_clauses([("update", None, {"nope": "1"})], ["k"])
    with pytest.raises(ValueError, match="cannot combine"):
        t.upsert(
            src, keys=["k"],
            matched_clauses=[("delete", None)],
            delete_keys=src.select("k"),
        )
    with pytest.raises(ValueError, match="requires matched_clauses"):
        t.upsert(src, keys=["k"], not_matched_insert=False)
    with pytest.raises(ValueError, match="requires matched_clauses"):
        t.upsert(src, keys=["k"], not_matched_condition="price > 0")


def test_delta_chain_cdf_records_row_level_truth(spark, tmp_path):
    """Under CDF the chain's row-level outcomes land in the cdc file:
    update pre/post pairs for fired updates, delete for fired deletes,
    insert for the insert leg, nothing for carried rows."""
    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )

    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, v string, price double",
    ))
    w.set_property("delta.enableChangeDataFeed", "true")
    src = spark.createDataFrame(
        [(1, "A", 5.0), (2, "B", 200.0), (3, "c", 30.0),
         (9, "I", 90.0)],
        "k long, v string, price double",
    )
    w.merge(spark, src, keys=["k"], matched_clauses=CLAUSES)
    ch = sorted(
        (r["k"], r["_change_type"])
        for r in DeltaTableReader(path)
        .changes(spark, starting_version=2)
        .collect()
    )
    assert ch == [
        (1, "delete"),
        (2, "update_postimage"), (2, "update_preimage"),
        (9, "insert"),
    ], ch  # k=3 matched but no clause fired (v equal): no change row


def test_delta_chain_preserves_row_tracking_ids(spark, tmp_path):
    """Fired updates keep the row's stable id (true update); carried
    rows keep id AND last-update version."""
    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )

    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k long, v string, price double",
    ).coalesce(1))
    w.set_row_tracking()
    before = {
        r["k"]: r["_row_id"]
        for r in DeltaTableReader(path).row_lineage(spark).collect()
    }
    w.merge(
        spark,
        spark.createDataFrame(
            [(2, "B", 200.0), (9, "i", 9.0)],
            "k long, v string, price double",
        ),
        keys=["k"],
        matched_clauses=[("update", "s.price > 100", {"v": "s.v"})],
    )
    after = {
        r["k"]: r["_row_id"]
        for r in DeltaTableReader(path).row_lineage(spark).collect()
    }
    assert after[1] == before[1] and after[2] == before[2]
    assert after[9] not in set(before.values())


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_sql_chained_merge(spark, tmp_path, fmt):
    t, _ = _mk(spark, tmp_path, fmt)
    spark.createDataFrame(
        [(1, "A", 5.0, "D"), (2, "B", 200.0, "U"),
         (3, "C", 30.0, "U"), (9, "I", 90.0, "I")],
        "k long, v string, price double, op string",
    ).createOrReplaceTempView("chain_batch")
    sql(
        spark,
        "MERGE INTO tgt AS tg USING chain_batch AS s ON tg.k = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED AND s.price > 100 "
        "THEN UPDATE SET v = s.v, price = s.price * 0.5 "
        "WHEN MATCHED AND tg.v != s.v THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.op = 'I' THEN INSERT *",
        tables={"tgt": t},
    )
    assert _rows(spark, t) == [
        (2, "B", 100.0), (3, "C", 30.0), (4, "d", 40.0),
        (9, "I", 90.0),
    ]
    # INSERT-only chain (no matched clause at all)
    spark.createDataFrame(
        [(2, "x", 0.0, "I"), (50, "n", 1.0, "I")],
        "k long, v string, price double, op string",
    ).createOrReplaceTempView("chain_batch2")
    sql(
        spark,
        "MERGE INTO tgt AS tg USING chain_batch2 AS s ON tg.k = s.k "
        "WHEN NOT MATCHED THEN INSERT *",
        tables={"tgt": t},
    )
    assert [k for k, _, _ in _rows(spark, t)] == [2, 3, 4, 9, 50]


def test_sql_chain_rejects_bad_shapes(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, "delta")
    spark.createDataFrame(
        [(1, "x", 1.0)], "k long, v string, price double"
    ).createOrReplaceTempView("bad_batch")
    # chained NOT MATCHED is now legal, but an unconditional clause
    # anywhere except last shadows everything after it
    with pytest.raises(ValueError, match="unreachable"):
        sql(
            spark,
            "MERGE INTO tgt AS tg USING bad_batch AS s ON tg.k = s.k "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED THEN INSERT *",
            tables={"tgt": t},
        )
    with pytest.raises(ValueError, match="target alias"):
        sql(
            spark,
            "MERGE INTO tgt AS tg USING bad_batch AS s ON tg.k = s.k "
            "WHEN NOT MATCHED AND tg.k > 0 THEN INSERT *",
            tables={"tgt": t},
        )
    with pytest.raises(ValueError, match="unsupported MERGE"):
        sql(
            spark,
            "MERGE INTO tgt AS tg USING bad_batch AS s ON tg.k = s.k "
            "WHEN MATCHED THEN FROBNICATE",
            tables={"tgt": t},
        )


def test_quoted_literal_in_clause_condition(spark, tmp_path):
    """The literal-aware splitter end-to-end: a SET expression holding
    quoted parens/commas parses and runs."""
    t, _ = _mk(spark, tmp_path, "delta")
    spark.createDataFrame(
        [(1, "A", 5.0)], "k long, v string, price double"
    ).createOrReplaceTempView("lit_batch")
    sql(
        spark,
        "MERGE INTO tgt AS tg USING lit_batch AS s ON tg.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = concat(s.v, '),'), "
        "price = s.price + 1",
        tables={"tgt": t},
    )
    got = {r["k"]: (r["v"], r["price"]) for r in t.read(spark).collect()}
    assert got[1] == ("A),", 6.0)


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_column_list_insert(spark, tmp_path, fmt):
    """WHEN NOT MATCHED THEN INSERT (cols) VALUES (exprs): assigned
    columns evaluate over the source row, unassigned NULL-pad — the
    last cell of the MERGE grammar square."""
    t, src = _mk(spark, tmp_path, fmt)
    t.upsert(
        src, keys=["k"],
        matched_clauses=[("update", None, None)],
        not_matched_set={"k": "k", "v": "upper(v)"},
    )
    got = {
        r["k"]: (r["v"], r["price"])
        for r in t.read(spark).collect()
    }
    assert got[9] == ("I", None)  # price unassigned -> NULL
    assert got[2] == ("B", 200.0)  # matched: SET *
    with pytest.raises(ValueError, match="unknown column"):
        t.upsert(
            src, keys=["k"],
            matched_clauses=[("update", None, None)],
            not_matched_set={"nope": "1"},
        )
    with pytest.raises(ValueError, match="requires matched_clauses"):
        t.upsert(src, keys=["k"], not_matched_set={"k": "k"})
    with pytest.raises(ValueError, match="contradicts"):
        t.upsert(
            src, keys=["k"],
            matched_clauses=[("update", None, None)],
            not_matched_insert=False,
            not_matched_set={"k": "k"},
        )


def test_sql_column_list_insert(spark, tmp_path):
    t, _ = _mk(spark, tmp_path, "delta")
    spark.createDataFrame(
        [(1, "new", 1.0), (42, "fresh", 42.0)],
        "k long, v string, price double",
    ).createOrReplaceTempView("colins_batch")
    sql(
        spark,
        "MERGE INTO tgt AS tg USING colins_batch AS s ON tg.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = s.v "
        "WHEN NOT MATCHED AND s.price > 10 "
        "THEN INSERT (k, v, price) VALUES (s.k, concat(s.v, '!'), "
        "s.price * 2)",
        tables={"tgt": t},
    )
    got = {
        r["k"]: (r["v"], r["price"]) for r in t.read(spark).collect()
    }
    assert got[1] == ("new", 10.0)  # matched: only v updated
    assert got[42] == ("fresh!", 84.0)  # column-list insert
    with pytest.raises(ValueError, match="columns but VALUES"):
        sql(
            spark,
            "MERGE INTO tgt AS tg USING colins_batch AS s "
            "ON tg.k = s.k "
            "WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)",
            tables={"tgt": t},
        )


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_chained_not_matched_clauses(spark, tmp_path, fmt):
    """Chained WHEN NOT MATCHED clauses: first-match-wins per
    unmatched source row; a row matching no clause does not insert.
    Mirrors the matched side's semantics (delta-spark's
    .whenNotMatchedInsert(condition=..., values=...) chain)."""
    t, _ = _mk(spark, tmp_path, fmt)
    src = spark.createDataFrame(
        [(1, "A", 5.0),     # matched -> SET *
         (10, "big", 200.0),   # clause 0 (price > 100): tagged insert
         (11, "mid", 50.0),    # clause 1 (price > 20): INSERT *
         (12, "tiny", 1.0)],   # no clause -> NOT inserted
        "k long, v string, price double",
    )
    t.upsert(
        src, keys=["k"],
        matched_clauses=[("update", None, None)],
        not_matched_clauses=[
            ("price > 100", {"k": "k", "v": "concat(v, '!')"}),
            ("price > 20", None),  # INSERT *
        ],
    )
    got = {r["k"]: (r["v"], r["price"]) for r in t.read(spark).collect()}
    assert got[1] == ("A", 5.0)        # matched replace
    assert got[10] == ("big!", None)   # clause 0: column-list, NULL pad
    assert got[11] == ("mid", 50.0)    # clause 1: INSERT *
    assert 12 not in got               # matched no clause
    assert got[4] == ("d", 40.0)       # untouched target


def test_chained_not_matched_validation(spark, tmp_path):
    t, src = _mk(spark, tmp_path, "delta")
    with pytest.raises(ValueError, match="requires matched_clauses"):
        t.upsert(src, keys=["k"],
                 not_matched_clauses=[(None, None)])
    with pytest.raises(ValueError, match="cannot combine"):
        t.upsert(
            src, keys=["k"],
            matched_clauses=[("update", None, None)],
            not_matched_condition="price > 1",
            not_matched_clauses=[(None, None)],
        )
    with pytest.raises(ValueError, match="contradicts"):
        t.upsert(
            src, keys=["k"],
            matched_clauses=[("update", None, None)],
            not_matched_insert=False,
            not_matched_clauses=[(None, None)],
        )
    with pytest.raises(ValueError, match="unreachable"):
        t.upsert(
            src, keys=["k"],
            matched_clauses=[("update", None, None)],
            not_matched_clauses=[(None, None), ("price > 1", None)],
        )
    with pytest.raises(ValueError, match="unknown"):
        t.upsert(
            src, keys=["k"],
            matched_clauses=[("update", None, None)],
            not_matched_clauses=[(None, {"nope": "1"})],
        )


def test_sql_chained_not_matched(spark, tmp_path):
    """Several WHEN NOT MATCHED [AND p] THEN INSERT clauses through
    the SQL front door — first-match-wins, and an unconditional
    clause anywhere but last is refused."""
    t, _ = _mk(spark, tmp_path, "delta")
    spark.createDataFrame(
        [(20, "x", 500.0), (21, "y", 50.0), (22, "z", 0.5)],
        "k long, v string, price double",
    ).createOrReplaceTempView("nmchain_batch")
    sql(
        spark,
        "MERGE INTO tgt AS tg USING nmchain_batch AS s ON tg.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND s.price > 100 "
        "THEN INSERT (k, v) VALUES (s.k, upper(s.v)) "
        "WHEN NOT MATCHED AND s.price > 10 THEN INSERT * ",
        tables={"tgt": t},
    )
    got = {r["k"]: (r["v"], r["price"]) for r in t.read(spark).collect()}
    assert got[20] == ("X", None)
    assert got[21] == ("y", 50.0)
    assert 22 not in got
    with pytest.raises(ValueError, match="unreachable"):
        sql(
            spark,
            "MERGE INTO tgt AS tg USING nmchain_batch AS s "
            "ON tg.k = s.k "
            "WHEN MATCHED THEN UPDATE SET * "
            "WHEN NOT MATCHED THEN INSERT * "
            "WHEN NOT MATCHED AND s.price > 10 THEN INSERT *",
            tables={"tgt": t},
        )


def test_column_list_insert_fills_defaults(spark, tmp_path):
    """delta-spark parity: a column-list INSERT that does not assign a
    DEFAULT-bearing column gets the DEFAULT value, not a NULL pad
    (PROTOCOL.md § Default Columns applies to MERGE inserts)."""
    import json
    import os

    from aws_glue_data_lake_spark.deltacompat import DeltaTableWriter

    path = str(tmp_path / "t")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "v", "type": "string", "nullable": True,
             "metadata": {}},
            {"name": "status", "type": "string", "nullable": True,
             "metadata": {"CURRENT_DEFAULT": "'active'"}},
        ],
    })
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        for a in [
            {"protocol": {
                "minReaderVersion": 1, "minWriterVersion": 7,
                "writerFeatures": ["appendOnly", "invariants",
                                   "allowColumnDefaults"],
            }},
            {"metaData": {
                "id": "defaults-merge", "format": {
                    "provider": "parquet", "options": {}},
                "schemaString": schema_string,
                "partitionColumns": [], "configuration": {},
                "createdTime": 0,
            }},
        ]:
            f.write(json.dumps(a) + "\n")
    t = open_table(path, "delta")
    t.append(spark.createDataFrame(
        [(1, "a", "old")], "k long, v string, status string"
    ))
    src = spark.createDataFrame(
        [(1, "A"), (2, "B")], "k long, v string"  # status ABSENT
    )
    # single column-list clause: status unassigned -> DEFAULT
    t.upsert(
        src, keys=["k"],
        matched_clauses=[("update", None, {"v": "s.v"})],
        not_matched_set={"k": "k", "v": "lower(v)"},
    )
    got = {r["k"]: (r["v"], r["status"])
           for r in t.read(spark).collect()}
    assert got[1] == ("A", "old")      # matched: status kept
    assert got[2] == ("b", "active")   # insert: DEFAULT, not NULL
    # chained clauses: same fallback
    src2 = spark.createDataFrame([(3, "C")], "k long, v string")
    t.upsert(
        src2, keys=["k"],
        matched_clauses=[("update", None, None)],
        not_matched_clauses=[("true", {"k": "k", "v": "v"})],
    )
    got = {r["k"]: (r["v"], r["status"])
           for r in t.read(spark).collect()}
    assert got[3] == ("C", "active")


@pytest.mark.parametrize("fmt", ["delta", "lake"])
def test_constraints_checked_post_projection(spark, tmp_path, fmt):
    """A CHECK constraint must hold on the FINAL written rows: a
    clause SET expression that synthesizes a violating value fails the
    commit even though the raw source batch is clean (delta-spark
    validates post-projection; checking only the source would let the
    violation poison the table)."""
    from aws_glue_data_lake_spark.lake import ConstraintViolation

    t, _ = _mk(spark, tmp_path, fmt)
    t.set_constraint("pos_price", "price > 0", spark=spark)
    clean_src = spark.createDataFrame(
        [(1, "A", 5.0)], "k long, v string, price double"
    )
    with pytest.raises(
        (ValueError, ConstraintViolation), match="pos_price"
    ):
        t.upsert(
            clean_src, keys=["k"],
            matched_clauses=[
                ("update", None, {"price": "t.price - 100"}),
            ],
        )
    # nothing landed
    assert sorted(r["price"] for r in t.read(spark).collect()) == [
        10.0, 20.0, 30.0, 40.0,
    ]
    # a clean SET commits
    t.upsert(
        clean_src, keys=["k"],
        matched_clauses=[("update", None, {"price": "t.price + 1"})],
    )
    got = {r["k"]: r["price"] for r in t.read(spark).collect()}
    assert got[1] == 11.0


def test_clause_update_recomputes_generated_columns(spark, tmp_path):
    """delta-spark's UPDATE contract in MERGE: a generated column
    whose INPUT a clause SET touches is re-derived over the
    post-update row — table content, NMBS updates, and the CDF
    postimage all agree (a stale derived value would silently break
    partition pruning on it)."""
    import json
    import os

    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )

    path = str(tmp_path / "t")
    log = os.path.join(path, "_delta_log")
    os.makedirs(log)
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True,
             "metadata": {}},
            {"name": "price", "type": "double", "nullable": True,
             "metadata": {}},
            {"name": "bucket", "type": "long", "nullable": True,
             "metadata": {
                 "delta.generationExpression": "CAST(price AS LONG)"
             }},
        ],
    })
    with open(os.path.join(log, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["appendOnly", "invariants",
                               "generatedColumns", "changeDataFeed"],
        }}) + "\n")
        f.write(json.dumps({"metaData": {
            "id": "gen-merge",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema_string, "partitionColumns": [],
            "configuration": {"delta.enableChangeDataFeed": "true"},
            "createdTime": 0,
        }}) + "\n")
    w = DeltaTableWriter(path)
    w.append(spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, price double"
    ))
    src = spark.createDataFrame([(1, 100.0)], "k long, price double")
    w.merge(
        spark, src, keys=["k"],
        matched_clauses=[
            ("update", None, {"price": "t.price + s.price"}),
        ],
        not_matched_by_source_clauses=[
            ("update", "price < 25", {"price": "price * 2"}),
        ],
    )
    got = sorted(
        (r["k"], r["price"], r["bucket"])
        for r in DeltaTableReader(path).to_df(spark).collect()
    )
    # k=1 matched (10+100=110 -> bucket 110), k=2 NMBS update
    # (20*2=40 -> bucket 40), k=3 carried (bucket 30)
    assert got == [
        (1, 110.0, 110), (2, 40.0, 40), (3, 30.0, 30),
    ], got
    post = sorted(
        (r["k"], r["bucket"])
        for r in DeltaTableReader(path)
        .changes(spark, starting_version=2)
        .where("_change_type = 'update_postimage'")
        .collect()
    )
    assert post == [(1, 110), (2, 40)], post
