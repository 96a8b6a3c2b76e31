"""Oracle-differential tests: every registered query with an oracle must
match DuckDB exactly (row count + values) — the local mirror of the
driver's t2 correctness gate."""

import pytest

from aws_glue_data_lake_spark.oracle import compare_result, run_oracle
from aws_glue_data_lake_spark.queries import all_oracles, all_queries

QUERIES = all_queries()
ORACLES = all_oracles()


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, sf_dir):
    spark_df = QUERIES[name](spark, sf_dir)
    oracle_pdf = run_oracle(ORACLES[name], sf_dir)
    problems = compare_result(spark_df, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_no_rows_only_queries():
    """Every registered query carries a DuckDB oracle — the driver's
    strongest check. This pins the invariant: a new query landing without
    an oracle fails here instead of silently downgrading to rows-only."""
    assert set(QUERIES) == set(ORACLES), sorted(set(QUERIES) - set(ORACLES))
