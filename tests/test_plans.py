"""Physical-plan assertions (SURVEY.md §4): the performance-critical plan
shapes are part of the engine contract, not an accident — these tests pin
them so a regression shows up as a test failure, not a bench cliff.

What must hold at any scale:
- selective predicates reach the parquet scan (PushedFilters);
- scans read only referenced columns (ReadSchema pruning);
- dimension joins broadcast, fact joins shuffle;
- rank-filter top-k uses WindowGroupLimit (partial top-k before shuffle);
- global LIMIT+ORDER BY uses TakeOrderedAndProject (no full sort).
"""

import pytest

from aws_glue_data_lake_spark.queries import all_queries

QUERIES = all_queries()
SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_filter_pushdown_and_pruning(spark):
    plan = formatted_plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reaches parquet
    assert "l_orderkey" not in plan.split("ReadSchema")[1].splitlines()[0]  # pruned


def test_q5_broadcasts_dimensions(spark):
    plan = plan_of(spark, "q5_local_supplier_volume")
    assert plan.count("BroadcastHashJoin") >= 3  # supplier/nation/region at least
    assert "EqualTo(r_name,ASIA)" in formatted_plan_of(
        spark, "q5_local_supplier_volume"
    )


def test_flagship_uses_window_group_limit(spark):
    # rank<=k filter must prune partial top-k BEFORE the window shuffle
    assert "WindowGroupLimit" in plan_of(spark, "flagship_latest_event_per_user")


def test_top10_orders_uses_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "sort_limit_top10_orders")


def test_scalar_math_limit_uses_take_ordered(spark):
    assert "TakeOrderedAndProject" in plan_of(spark, "scalar_math_lineitem")


def test_window_partition_key_filter_pushes_to_scan(spark):
    plan = formatted_plan_of(spark, "window_lag_lead_order_gaps")
    assert "LessThan(o_custkey,1000)" in plan


def test_semi_and_anti_join_operators(spark):
    assert "LeftSemi" in plan_of(spark, "join_semi_customers_with_urgent_orders")
    assert "LeftAnti" in plan_of(spark, "join_anti_customers_without_orders")


def test_sim_topk_broadcasts_query_side(spark):
    assert "Broadcast" in plan_of(spark, "sim_topk_bruteforce")
