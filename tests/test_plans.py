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

import re

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


def test_q6_all_three_predicates_push_to_scan(spark):
    plan = formatted_plan_of(spark, "q6_forecast_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan
    assert "LessThan(l_quantity,24" in plan
    # projection reaches the scan: unreferenced fact columns never read
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_orderkey" not in read_schema and "l_tax" not in read_schema


def test_q4_exists_decorrelates_to_semi_join(spark):
    assert "LeftSemi" in plan_of(spark, "q4_priority_with_late_ship")


def test_q18_having_survivors_broadcast(spark):
    assert "BroadcastHashJoin" in plan_of(spark, "q18_large_volume_customers")


def test_events_bucketing_stays_jvm_side(spark):
    # event-time bucketing must be built-in TimeWindow, not a Python UDF
    assert "BatchEvalPython" not in plan_of(spark, "events_daily_type_counts")


def test_embedding_dedup_joins_on_band_keys(spark):
    """The embedding near-dup candidate join must be a hash join KEYED on
    the (label, phase, bucket-combo) columns — never a label-only join with
    a post-join band filter (the label-block size dependence round 2
    removed)."""
    plan = plan_of(spark, "dedup_embedding_cosine")
    joins = [l for l in plan.splitlines() if "HashJoin" in l]
    assert any(
        "b1" in l and "b4" in l and "p#" in l for l in joins
    ), f"no band-keyed hash join found:\n{plan[:2000]}"


def test_lsh_band_join_is_keyed_not_cartesian(spark):
    plan = plan_of(spark, "dedup_minhash_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_extract_is_arrow_batched(spark):
    # mapInPandas shows as MapInPandas (Arrow), never row-at-a-time
    # BatchEvalPython.
    plan = plan_of(spark, "multimodal_feature_extract")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_range_join_is_bin_keyed_not_nested_loop(spark):
    """The bin-bucketed range join must plan as a hash equi-join on
    (user_id, bin) — never a nested-loop over the raw range predicate."""
    plan = plan_of(spark, "join_range_event_order_window")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    fplan = formatted_plan_of(spark, "join_range_event_order_window")
    assert "LessThan(user_id,50)" in fplan  # outer filter reaches the scan


def test_lateral_subquery_decorrelates(spark):
    plan = plan_of(spark, "subquery_lateral_top_order")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_dedup_band_join_keyed(spark):
    plan = plan_of(spark, "dedup_incremental_new_docs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_join_has_no_exchange(spark):
    """Same-bucketed tables joined on the bucket key must plan shuffle-free:
    the whole point of paying the bucketing cost at write time."""
    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.operators.layout import (
        bucketed_join,
        write_bucketed,
    )
    from aws_glue_data_lake_spark.queries.base import t

    write_bucketed(
        t(spark, SF_DIR, "orders").select("o_orderkey", "o_orderstatus"),
        "orders_bkt_plan_test",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        t(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice"),
        "lineitem_bkt_plan_test",
        ["l_orderkey"],
        8,
        sort_cols=["l_orderkey"],
    )
    # At fixture scale the planner prefers a broadcast join (also
    # shuffle-free); disable it so the plan shows the large-table path the
    # bucketing exists for — SortMergeJoin over co-bucketed scans.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(
            spark,
            "orders_bkt_plan_test",
            "lineitem_bkt_plan_test",
            on=[F.col("l_orderkey") == F.col("o_orderkey")],
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan


def test_salted_join_splits_forced_hot_key(spark):
    """Skew stress for the join_salted_segment_revenue pattern: force 90%
    of sf0.1 fact rows onto ONE customer key and measure shuffle balance.
    Keyed by the raw join key, the hot key's rows all land in a single
    reducer (the straggler that stalls a 1000-executor job); keyed by
    (key, salt) they spread across the salt fan-out. This pins the WIN,
    not just the plan shape — if salting silently stopped spreading rows,
    this fails before the bench cliff does."""
    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.queries.base import t as load

    o = load(spark, "/root/testdata/sf0.1", "orders").select(
        "o_orderkey", "o_custkey"
    )
    hot = o.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 10 != 0, F.lit(7)).otherwise(
            F.col("o_custkey")
        ),
    )
    salted = hot.withColumn("salt", (F.col("o_orderkey") % 8).cast("int"))

    def max_partition_share(df, *cols):
        sizes = (
            df.repartition(8, *[F.col(c) for c in cols])
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        counts = [r["count"] for r in sizes]
        return max(counts) / sum(counts)

    assert max_partition_share(hot, "o_custkey") > 0.85  # the straggler
    assert max_partition_share(salted, "o_custkey", "salt") < 0.35


def test_decontaminate_broadcasts_eval_grams(spark):
    """Decontamination's scale contract: the eval-side gram set is
    broadcast, so the corpus side is probed in place — no shuffle of
    corpus trigrams onto a join key. A SortMergeJoin here would shuffle
    the whole corpus's gram explosion at 100 TB."""
    plan = plan_of(spark, "text_decontaminate_overlap")
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_token_count_stays_in_codegen(spark):
    """The pre-tokenizer regex runs JVM-side: no Python evaluation
    operators may appear, the scan reads only the referenced columns, and
    the only exchanges are the final per-source aggregate + ORDER BY."""
    plan = plan_of(spark, "text_bpe_token_count")
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_op not in plan
    # Pruning pin, order-insensitive: the scan must read exactly the
    # referenced columns, whatever order the scan happens to emit them in.
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"text", "source", "n_chars"}
    assert plan.count("Exchange") <= 2  # partial->final agg + ORDER BY


def test_q13_aggregates_filtered_orders_before_left_join(spark):
    """Q13's scale contract: the priority filter and a two-column
    projection reach the orders scan, and orders is reduced to per-custkey
    counts BEFORE the left join — the join must never shuffle the
    unfiltered orders table."""
    plan = formatted_plan_of(spark, "q13_customer_order_distribution")
    assert "Not(EqualTo(o_orderpriority,1-URGENT))" in plan
    m = re.search(r"ReadSchema: struct<([^>]*o_custkey[^>]*)>", plan)
    assert m, plan
    orders_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert orders_cols == {"o_custkey", "o_orderpriority"}
    # the left join's build side is the aggregated counts: a HashAggregate
    # must appear below the LeftOuter join in the tree
    tree = plan.split("(1) Scan")[0]
    join_at = tree.index("LeftOuter")
    assert "HashAggregate" in tree[join_at:], tree


def test_q20_plans_semi_join_chain(spark):
    """Q20's three nesting levels must each plan as a broadcast semi join
    (part-filter into lineitem, survivors and nation keys into supplier) —
    cf. the EXISTS pin above; a SortMergeJoin would shuffle the fact side
    for dimension-sized probe lists."""
    plan = plan_of(spark, "q20_small_part_bulk_suppliers")
    assert plan.count("LeftSemi") >= 3
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    fplan = formatted_plan_of(spark, "q20_small_part_bulk_suppliers")
    assert "StringStartsWith(p_name,small)" in fplan
    assert "GreaterThanOrEqual(l_shipdate" in fplan


def test_q19_pushes_bracket_predicates(spark):
    """The OR-of-AND brackets must not defeat pushdown entirely: the
    lineitem scan needs the quantity bounds as pushed filters (the
    cross-bracket OR pushes as a range union) and part must broadcast."""
    plan = formatted_plan_of(spark, "q19_bracketed_revenue")
    assert "BroadcastHashJoin" in plan_of(spark, "q19_bracketed_revenue")
    assert "l_quantity" in plan.split("PushedFilters")[1].splitlines()[0]


def test_q21_plans_composite_semi_and_anti(spark):
    """Q21's EXISTS/NOT EXISTS pair must plan as one semi and one anti
    join with the suppkey inequality as a join condition — never a
    correlated re-execution or a cartesian."""
    plan = plan_of(spark, "q21_sole_late_shipper")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_scalar_broadcast_cross_joins(spark):
    """q11/q22-style global scalars must enter as broadcast nested-loop
    cross joins of ONE row, not a shuffle: BroadcastNestedLoopJoin (or a
    broadcast exchange feeding the cross) and no CartesianProduct."""
    for name in ("q11_important_part_value", "q22_idle_funded_customers",
                 "sample_temporal_split", "events_gap_fill_hourly"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" in plan, name


def test_q2_min_cost_probes_broadcast_and_window_once(spark):
    """Q2's scale contract: the part filter pushes to the scan, both probe
    lists (filtered parts, EUROPE suppliers) enter lineitem as broadcast
    semi joins, and the correlated MIN decorrelates into ONE window over
    the aggregated cost table — never a per-part re-execution or a
    cartesian."""
    plan = plan_of(spark, "q2_min_cost_supplier")
    assert plan.count("LeftSemi") >= 2
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    fplan = formatted_plan_of(spark, "q2_min_cost_supplier")
    assert "EqualTo(p_size,15)" in fplan and "EqualTo(p_type,LARGE)" in fplan


def test_q8_q9_broadcast_all_dimensions(spark):
    """Q8/Q9 are the widest star joins in the suite: every dimension side
    (part/supplier/nation/region) must broadcast so the only exchanges are
    the fact joins + the final agg, and the selective dimension predicate
    must reach the scan."""
    p8 = plan_of(spark, "q8_national_market_share")
    assert p8.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in p8
    assert "EqualTo(p_type,ECONOMY)" in formatted_plan_of(
        spark, "q8_national_market_share"
    )
    p9 = plan_of(spark, "q9_product_type_profit")
    assert p9.count("BroadcastHashJoin") >= 3
    assert "StringContains(p_name,gear)" in formatted_plan_of(
        spark, "q9_product_type_profit"
    )


def test_q15_scalar_max_broadcasts(spark):
    """Q15's scalar MAX must enter broadcast-side — Catalyst actually
    upgrades the equality-filtered 1-row cross join to a BroadcastHashJoin
    KEYED ON the scalar itself (stronger than the q11/q22 BNLJ: the
    equality becomes the join key), and the quarter predicate must prune
    the lineitem scan."""
    plan = plan_of(spark, "q15_top_supplier")
    assert re.search(r"Broadcast(Hash|NestedLoop)Join .*max_revenue", plan), plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(l_shipdate" in formatted_plan_of(
        spark, "q15_top_supplier"
    )


def test_point_in_time_join_is_union_carry_not_interval_join(spark):
    """The PIT lookup must plan as the asof union-and-carry (one window
    carrying the latest version forward) — NEVER an interval join that
    materializes (probe, earlier-version) pairs: no join operator at all
    except the broadcast 1-row span cross that builds the probe grid."""
    plan = plan_of(spark, "join_point_in_time")
    for op in ("SortMergeJoin", "ShuffledHashJoin", "CartesianProduct",
               "BroadcastHashJoin"):
        assert op not in plan, op
    assert plan.count("BroadcastNestedLoopJoin") == 1
    assert "last(" in plan  # the carry window


def test_ivf_persisted_probe_prunes_partitions(spark):
    """The persisted IVF store is partitioned by centroid bucket and the
    probe must read only the probed buckets: the assignments scan needs a
    dynamic-pruning PartitionFilter on centroid_id (directory-level
    pruning — the inverted-file property that makes the index an index)."""
    plan = formatted_plan_of(spark, "sim_ivf_persisted_probe")
    seg = plan.split("PartitionFilters")[1].splitlines()[0]
    assert "dynamicpruning" in seg and "centroid_id" in seg


def test_quality_funnel_is_single_pass(spark):
    """The funnel must stay one corpus scan + a 1-row aggregate: no join,
    no Python operators, at most the two agg exchanges + final sort."""
    plan = plan_of(spark, "pipeline_quality_filter_funnel")
    for op in ("Join", "BatchEvalPython", "ArrowEvalPython"):
        assert op not in plan
    assert plan.count("Exchange") <= 3


def test_sql_registered_udf_is_arrow_vectorized(spark):
    """The SQL-catalog-registered UDF must plan as an Arrow-batched
    ArrowEvalPython, never a row-at-a-time BatchEvalPython."""
    plan = plan_of(spark, "text_sql_registered_udf")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_funnel_conversion_pushes_stage_filters(spark):
    """Each funnel stage scans only its event_type — the predicate must
    reach the parquet scan, and nothing may degenerate to a cartesian."""
    plan = formatted_plan_of(spark, "funnel_user_conversion")
    for stage in ("view", "click", "purchase"):
        assert f"EqualTo(event_type,{stage})" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_retention_prunes_columns(spark):
    """The events scan feeds first-seen + activity from (user_id, ts)
    only — no other column may survive into ReadSchema."""
    plan = formatted_plan_of(spark, "cohort_weekly_retention")
    for seg in plan.split("ReadSchema:")[1:]:
        schema = seg.splitlines()[0]
        assert "user_id" in schema and "ts" in schema
        for col in ("event_type", "value", "props"):
            assert col not in schema


def test_chunk_stride_is_scan_shaped(spark):
    """Chunking is pure per-doc map work: no join, no Python operator,
    no aggregate — the only exchange is the final deterministic sort."""
    plan = plan_of(spark, "text_chunk_stride")
    for op in ("Join", "ArrowEvalPython", "BatchEvalPython", "HashAggregate"):
        assert op not in plan
    assert plan.count("Exchange") <= 1


def test_dup_block_join_is_keyed(spark):
    """The shared-block probe joins ON the block string — a keyed join
    (broadcast or shuffle), never an unkeyed nested-loop flood."""
    plan = plan_of(spark, "text_dup_block_fraction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_hll_rollup_uses_mergeable_partial_agg(spark):
    """The daily sketch build must plan as an ObjectHashAggregate with a
    partial phase (map-side sketch merge) — that partial/final split IS
    the mergeable-rollup property the query exists to demonstrate."""
    plan = plan_of(spark, "agg_hll_sketch_rollup")
    assert "ObjectHashAggregate" in plan
    assert "partialhllsketchagg" in plan.lower().replace("_", "")


def test_zscore_shares_the_event_type_exchange(spark):
    """Frame window and the per-type aggregate both key on event_type —
    Catalyst must not add a third hash exchange for the final groupBy."""
    plan = plan_of(spark, "window_trailing_zscore_anomalies")
    assert plan.count("hashpartitioning(event_type") <= 2


def test_heavy_hitters_recount_broadcasts_candidates(spark):
    """Phase 2 must be a broadcast LEFT SEMI against the tiny candidate
    set (the corpus-side explode never shuffles for the probe), and the
    MG phase must be Arrow-batched mapInPandas."""
    plan = plan_of(spark, "text_heavy_hitters_mg")
    assert "MapInPandas" in plan
    assert re.search(r"BroadcastHashJoin \[word[^\]]*\], \[word[^\]]*\], LeftSemi", plan)


def test_python_datasource_filter_pushdown(spark):
    """The id-range predicate must be absorbed by the custom reader's
    pushFilters (partition pruning at the source): the physical plan keeps
    only the isnotnull residue, and the reader plans partitions for the
    narrowed range only."""
    plan = plan_of(spark, "scan_python_datasource")
    assert "BatchScan cdc_feed" in plan
    scan_filter = [ln for ln in plan.splitlines() if "Filter" in ln and "id#" in ln]
    for ln in scan_filter:
        assert ">=" not in ln and "<" not in ln, ln  # range absorbed by source

    from aws_glue_data_lake_spark.pydatasource import CdcFeedReader
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan, EqualTo

    r = CdcFeedReader({"n_rows": 60_000, "n_parts": 8})
    leftover = list(
        r.pushFilters(
            [
                GreaterThanOrEqual(("id",), 10_000),
                LessThan(("id",), 50_000),
                EqualTo(("op",), "I"),
            ]
        )
    )
    assert [type(f).__name__ for f in leftover] == ["EqualTo"]  # op is Spark's
    parts = r.partitions()
    assert parts[0].lo == 10_000 and parts[-1].hi == 50_000
    assert len(parts) == 8


def test_attribution_join_is_keyed_not_cartesian(spark):
    """The attribution candidate join must shuffle on user_id (keyed
    equi-join with banded range residual) — a nested-loop/cartesian plan
    here would be quadratic in events at scale."""
    plan = plan_of(spark, "window_attribution_linear")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pmi_broadcasts_unigram_model(spark):
    """Both unigram-model sides and the 1-row total must broadcast: the
    skewed word keys must never shuffle the bigram table."""
    plan = plan_of(spark, "text_pmi_bigrams")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_pagerank_broadcasts_dimensions(spark):
    """The edge build joins fact tables to nation/supplier/customer dims —
    all dimension sides must broadcast; no cartesian anywhere in the
    3-iteration loop."""
    plan = plan_of(spark, "graph_pagerank_trade")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 3


def test_path_triples_single_window_exchange_and_topk(spark):
    """Path mining's scale contract: both LEAD offsets share one window
    spec (one hash exchange on user_id), the path count partial-aggregates
    before its exchange, and the top-20 plans as TakeOrderedAndProject —
    never a global Sort."""
    plan = plan_of(spark, "events_path_triples")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Window") == 1
    # one exchange for the window partition, one for the final agg
    assert plan.count("Exchange") == 2, plan


def test_bloom_prefilter_probe_joins_on_word_index(spark):
    """The bloom bitmap is a relational (word_idx, word) table probed by an
    equi-join — never a driver-side structure: the plan must contain the
    bit_or bitmap aggregate, the probe join, and a LeftSemi for the exact
    confirmation pass (which runs only on candidates' grams)."""
    plan = plan_of(spark, "dedup_bloom_gram_prefilter")
    assert "bit_or" in plan
    assert "LeftSemi" in plan
    for py_op in ("BatchEvalPython", "ArrowEvalPython"):
        assert py_op not in plan


def test_asof_nearest_single_shuffle_two_windows(spark):
    """Nearest as-of keeps the operator's core contract: ONE exchange on
    the join key feeding BOTH direction windows (the forward carry is a
    second in-partition sort, never a second shuffle). The final ORDER BY
    is the only other exchange."""
    plan = plan_of(spark, "join_asof_nearest_event_order")
    assert plan.count("Window") == 2
    assert plan.count("Exchange") <= 2, plan  # key hash + final range


def test_text_scan_parses_in_codegen(spark):
    """The plain-text ingest path must parse in-plan: no Python operators,
    and the whole aggregate reads the staged text exactly once."""
    plan = plan_of(spark, "scan_text_source")
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_op not in plan
    assert plan.count("Scan text") == 1, plan


def test_drift_audit_is_one_pass(spark):
    """The drift audit touches the raw stream once: a single parquet scan
    reading only (ts, value), partial-aggregated to |days| rows before the
    exchange; the lag window runs over the dimension-sized result."""
    # formatted mode prints each node twice (tree + detail) — count scans
    # in the executed-plan string instead.
    assert plan_of(spark, "dq_daily_value_drift").count("Scan parquet") == 1
    plan = formatted_plan_of(spark, "dq_daily_value_drift")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"ts", "value"}, read_cols


def test_ewma_filter_pushdown_single_exchange(spark):
    """The user_id slice must reach the parquet scan, and both window specs
    (ordered frame + latest-row rank) share ONE user_id exchange."""
    plan = formatted_plan_of(spark, "window_ewma_smoothing")
    assert "LessThan(user_id,40)" in plan
    full = plan_of(spark, "window_ewma_smoothing")
    # one hash exchange shared by both window specs (the second Exchange
    # in the plan is the final ORDER BY's range partitioning)
    assert full.count("Exchange hashpartitioning(user_id") == 1


def test_null_safe_join_is_hash_join(spark):
    """eqNullSafe must plan as a hash join on the null-safe key — never a
    BroadcastNestedLoopJoin (the silent O(n*m) fallback for non-equi
    conditions)."""
    plan = plan_of(spark, "join_null_safe_eq")
    assert "NestedLoop" not in plan
    assert "Join" in plan


def test_pq_adc_broadcasts_lut_and_codebook(spark):
    """PQ query time must be a codes-side scan with broadcast lookup
    structures: the codebook (M*K rows) and the query LUT (|Q|*M*K rows)
    broadcast; nothing may plan a cartesian product."""
    plan = plan_of(spark, "sim_pq_adc_topk")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_listagg_aggregates_before_join(spark):
    """The customer side must aggregate to nation cardinality BEFORE any
    join with the region dimension — customer may only shuffle on its own
    group-by key, never on a post-join composite."""
    plan = plan_of(spark, "agg_listagg_ordered")
    # no exchange may partition customer rows by a region/join-derived key
    assert "Exchange hashpartitioning(c_custkey" not in plan


def test_interval_overlap_is_keyed_join(spark):
    """The interval-overlap join must plan as a hash join on (user, bin) —
    bin replication bounds the pair space; no nested-loop fallback."""
    plan = plan_of(spark, "join_interval_overlap")
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_transition_matrix_single_exchange_before_agg(spark):
    """LEAD and the per-state normalization must not shuffle the events
    table twice: one user-keyed exchange feeds the window; the aggregate
    and the probability window run over the types-squared table."""
    plan = plan_of(spark, "events_transition_matrix")
    assert plan.count("Exchange hashpartitioning(user_id") == 1


def test_arrow_udf_is_arrow_eval(spark):
    """useArrow=True scalar UDF must plan as ArrowEvalPython (Arrow batch
    transfer), never pickled row-at-a-time BatchEvalPython."""
    plan = plan_of(spark, "text_arrow_udf_vowels")
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_zscore_prefix_sum_envelope_and_boundary_exactness(spark):
    """window_trailing_zscore_anomalies replaced O(rows×200) sliding
    decimal frames with whole-partition prefix sums (r14). The prefix
    p2 = running SUM(value²) accumulates into decimal(38,12) over the
    WHOLE partition — capacity 10^26 — where the old frame never held
    more than 200 values. Two pins (VERDICT r14 item 6):

    1. corpus guard — per-event_type value-mass stays ≥6 orders of
       magnitude under the envelope, so a future fixture change that
       could overflow fails HERE, not as an ANSI error mid-bench;
    2. boundary exactness — on a synthetic slab pushed near the
       envelope (50 rows of the decimal(18,6) max, prefix ≈ 5×10^25),
       the lag-difference frame sums are still bit-identical to the
       direct sliding-frame sums.
    """
    from pyspark.sql import Window, functions as F

    from aws_glue_data_lake_spark.queries import windows as W
    from aws_glue_data_lake_spark.tables import load_table, with_ts_us

    # -- 1. corpus envelope guard (sf0.1: the bench fixture) ------------
    ev = with_ts_us(load_table(spark, "/root/testdata/sf0.1", "events"))
    dec = F.col("value").cast("decimal(18,6)")
    mass = ev.groupBy("event_type").agg(
        F.sum(dec * dec).cast("double").alias("m2"),
        F.sum(F.abs(dec)).cast("double").alias("m1"),
    )
    for r in mass.collect():
        assert r["m2"] < 1e20, f"{r}: p2 mass approaching decimal(38,12)"
        assert r["m1"] < 1e16, f"{r}: p1 mass approaching decimal(28,6)"

    # -- 2. exactness at the envelope boundary --------------------------
    big = "999999999999.999999"  # decimal(18,6) max
    # 75 max-magnitude rows → prefix p2 ≈ 7.5×10^25, just under the
    # decimal(38,12) capacity of 10^26
    rows = [
        (i, 1, big if i % 4 == 0 else "0.000001") for i in range(300)
    ]
    slab = spark.createDataFrame(
        rows, "rn int, g int, v string"
    ).select("rn", "g", F.col("v").cast("decimal(18,6)").alias("dec"))
    order_w = Window.partitionBy("g").orderBy("rn")
    run = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frame = order_w.rowsBetween(-W._ZWIN, -1)
    p2 = F.sum(F.col("dec") * F.col("dec")).over(run)
    direct = F.sum(F.col("dec") * F.col("dec")).over(frame)
    z = F.lit(0).cast("decimal(38,12)")
    pre = slab.select(
        "rn",
        F.row_number().over(order_w).alias("rown"),
        p2.alias("p2"),
        direct.alias("direct"),
    )
    lagged = pre.select(
        "rn",
        "direct",
        F.when(
            F.col("rown") > 1,
            F.coalesce(F.lag("p2", 1).over(Window.orderBy("rn")), z)
            - F.coalesce(F.lag("p2", W._ZWIN + 1).over(Window.orderBy("rn")), z),
        ).alias("viaprefix"),
    )
    bad = lagged.where(
        ~(
            (F.col("direct").isNull() & F.col("viaprefix").isNull())
            | (F.col("direct") == F.col("viaprefix"))
        )
    ).count()
    assert bad == 0
