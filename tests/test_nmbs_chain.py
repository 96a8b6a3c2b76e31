"""Chained WHEN NOT MATCHED BY SOURCE clauses (round 14): delta-spark's
``.whenNotMatchedBySourceUpdate(condition=, set=)
.whenNotMatchedBySourceDelete(condition=)`` chain — several conditional
UPDATE/DELETE clauses over unmatched TARGET rows, first-match-wins, a
row matching no clause carries unchanged — on all three writers and
the SQL front door, completing the third MERGE leg's grammar the same
way the matched and not-matched legs were completed."""

import pytest

from aws_glue_data_lake_spark.sqlfront import sql
from aws_glue_data_lake_spark.table import open_table


def _mk(spark, tmp_path, fmt):
    t = open_table(str(tmp_path / fmt), fmt).create(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
             (4, "d", 40.0), (5, "e", 50.0)],
            "k long, v string, price double",
        ).repartition(2)
    )
    src = spark.createDataFrame(
        [(1, "A", 11.0), (9, "I", 90.0)],
        "k long, v string, price double",
    )
    return t, src


def _rows(spark, t):
    return sorted(
        (r["k"], r["v"], r["price"]) for r in t.read(spark).collect()
    )


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_chained_nmbs_first_match_wins(spark, tmp_path, fmt):
    """k=1 matched (replaced); k=9 inserted. Unmatched targets:
    k=2 -> clause 0 (delete, price < 25); k=3 -> clause 1 (update,
    price < 35: flag + halve) even though clause 2 also matches;
    k=4 -> clause 2 (update, v = 'd': rename); k=5 -> no clause,
    carried unchanged."""
    t, src = _mk(spark, tmp_path, fmt)
    t.upsert(
        src, keys=["k"],
        matched_clauses=[("update", None, None)],
        not_matched_by_source_clauses=[
            ("delete", "price < 25"),
            ("update", "price < 35",
             {"v": "concat(v, '!')", "price": "price / 2"}),
            ("update", "v = 'd'", {"v": "'renamed'"}),
        ],
    )
    assert _rows(spark, t) == [
        (1, "A", 11.0),
        (3, "c!", 15.0),
        (4, "renamed", 40.0),
        (5, "e", 50.0),
        (9, "I", 90.0),
    ]


@pytest.mark.parametrize("fmt", ["delta", "iceberg", "lake"])
def test_sql_chained_nmbs(spark, tmp_path, fmt):
    t, _ = _mk(spark, tmp_path, fmt)
    spark.createDataFrame(
        [(1, "A", 11.0)], "k long, v string, price double"
    ).createOrReplaceTempView(f"nmbs_chain_batch_{fmt}")
    sql(
        spark,
        "MERGE INTO tgt AS tg USING "
        f"nmbs_chain_batch_{fmt} AS s ON tg.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY SOURCE AND tg.price < 25 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE AND tg.price < 45 "
        "THEN UPDATE SET v = upper(v)",
        tables={"tgt": t},
    )
    assert _rows(spark, t) == [
        (1, "A", 11.0),
        (3, "C", 30.0),
        (4, "D", 40.0),
        (5, "e", 50.0),
    ]


def test_chained_nmbs_validation(spark, tmp_path):
    t, src = _mk(spark, tmp_path, "delta")
    with pytest.raises(ValueError, match="cannot combine"):
        t.upsert(
            src, keys=["k"],
            not_matched_by_source="delete",
            not_matched_by_source_clauses=[("delete", None)],
        )
    with pytest.raises(ValueError, match="unreachable"):
        t.upsert(
            src, keys=["k"],
            not_matched_by_source_clauses=[
                ("delete", None), ("update", "price < 1", {"v": "'x'"}),
            ],
        )
    with pytest.raises(ValueError, match="SET \\*"):
        t.upsert(
            src, keys=["k"],
            not_matched_by_source_clauses=[("update", None, None)],
        )
    with pytest.raises(ValueError, match="unknown"):
        t.upsert(
            src, keys=["k"],
            not_matched_by_source_clauses=[
                ("update", None, {"nope": "1"}),
            ],
        )


def test_delta_chained_nmbs_cdf(spark, tmp_path):
    """CDF records each unmatched row's winning-clause outcome: delete
    rows for winning deletes, pre/post pairs for winning updates,
    nothing for carried rows."""
    from aws_glue_data_lake_spark.deltacompat import (
        DeltaTableReader,
        DeltaTableWriter,
    )

    path = str(tmp_path / "t")
    w = DeltaTableWriter(path)
    w.create(spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0),
         (5, "e", 50.0)],
        "k long, v string, price double",
    ))
    w.set_property("delta.enableChangeDataFeed", "true")
    src = spark.createDataFrame(
        [(1, "A", 11.0)], "k long, v string, price double"
    )
    w.merge(
        spark, src, keys=["k"],
        matched_clauses=[("update", None, None)],
        not_matched_by_source_clauses=[
            ("delete", "price < 25"),
            ("update", "price < 35", {"v": "upper(v)"}),
        ],
    )
    ch = sorted(
        (r["k"], r["_change_type"], r["v"])
        for r in DeltaTableReader(path)
        .changes(spark, starting_version=2)
        .collect()
    )
    assert ch == [
        (1, "update_postimage", "A"),
        (1, "update_preimage", "a"),
        (2, "delete", "b"),
        (3, "update_postimage", "C"),
        (3, "update_preimage", "c"),
    ], ch  # k=5 carried: no change row
