"""Scalar-function surface (SURVEY.md §2.9): string / date / math / array /
JSON expressions, all JVM-side built-ins (no Python UDFs — whole-stage
codegen keeps these inside the scan stage).

The reference's only scalar expressions are comparisons on ``op`` and the
event-time column (icberg/iceberg_tables.py:35,51,103); the full surface
here is north-star requirement. Dialect notes: every function below has an
exact DuckDB counterpart; floor/ceil are cast to BIGINT (DuckDB returns
DOUBLE), natural log is rounded to 6 (libm vs JVM last-ulp drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_glue_data_lake_spark.queries.base import Registry, t

REGISTRY = Registry()
_q = REGISTRY.query


@_q(
    "scalar_string_part_features",
    oracle="""
SELECT p_partkey,
       LOWER(p_name) AS name_lower,
       UPPER(p_brand) AS brand_upper,
       CAST(LENGTH(p_name) AS INT) AS name_len,
       SUBSTRING(p_type, 1, 8) AS type_prefix,
       REGEXP_EXTRACT(p_type, '^([a-zA-Z]+)', 1) AS type_first_word,
       CAST(LENGTH(p_name) - LENGTH(REPLACE(p_name, ' ', '')) + 1 AS INT) AS name_words,
       CONCAT(p_brand, '#', CAST(p_size AS VARCHAR)) AS brand_size,
       TRIM(CONCAT('  ', p_name, '  ')) AS name_trimmed,
       REPLACE(p_type, ' ', '_') AS type_snake
FROM part
ORDER BY p_partkey
""",
)
def scalar_string_part_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("int").alias("name_len"),
        F.substring("p_type", 1, 8).alias("type_prefix"),
        F.regexp_extract("p_type", r"^([a-zA-Z]+)", 1).alias("type_first_word"),
        (F.length("p_name") - F.length(F.replace(F.col("p_name"), F.lit(" "))) + 1)
        .cast("int")
        .alias("name_words"),
        F.concat(F.col("p_brand"), F.lit("#"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
    ).orderBy("p_partkey")


@_q(
    "scalar_date_order_calendar",
    oracle="""
SELECT CAST(YEAR(o_orderdate) AS INT) AS order_year,
       CAST(MONTH(o_orderdate) AS INT) AS order_month,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18, 6))) AS DOUBLE) AS total_price
FROM orders
GROUP BY 1, 2, 3
ORDER BY order_year, order_month
""",
)
def scalar_date_order_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
            F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("total_price"),
        )
        .orderBy("order_year", "order_month")
    )


@_q(
    "scalar_math_lineitem",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price,
       ABS(l_discount - 0.05) AS discount_dev,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(CEIL(l_extendedprice / 1000) AS BIGINT) AS price_kilo_ceil,
       ROUND(SQRT(l_extendedprice), 6) AS price_sqrt,
       ROUND(LN(l_extendedprice + 1), 6) AS price_ln,
       CAST(l_partkey % 10 AS BIGINT) AS part_bucket
FROM lineitem
ORDER BY l_orderkey, l_linenumber
LIMIT 1000
""",
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("net_price"),
        F.abs(F.col("l_discount") - 0.05).alias("discount_dev"),
        F.floor("l_quantity").cast("bigint").alias("qty_floor"),
        F.ceil(F.col("l_extendedprice") / 1000).cast("bigint").alias("price_kilo_ceil"),
        F.round(F.sqrt("l_extendedprice"), 6).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        (F.col("l_partkey") % 10).cast("bigint").alias("part_bucket"),
    ).orderBy("l_orderkey", "l_linenumber").limit(1000)
    # LIMIT 1000 (unique (orderkey, linenumber) tiebreaker): per-row scalar
    # coverage doesn't need the full table shipped to the driver — Spark
    # plans this as TakeOrderedAndProject (per-partition top-k, no global
    # sort), the scale-correct shape.


# JSON extraction on the events.props payload (FIXTURES.md: e.g. {"k": 87}).
@_q(
    "scalar_json_events_props",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def scalar_json_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
        )
        .orderBy("event_type")
    )


# Conditional expressions: CASE / COALESCE / NULLIF over the event stream.
@_q(
    "scalar_case_event_classes",
    oracle="""
SELECT CASE
         WHEN event_type IN ('purchase', 'signup') THEN 'conversion'
         WHEN event_type = 'error' THEN 'failure'
         ELSE 'engagement'
       END AS event_class,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(18, 6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
ORDER BY event_class
""",
)
def scalar_case_event_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    cls = (
        F.when(F.col("event_type").isin("purchase", "signup"), "conversion")
        .when(F.col("event_type") == "error", "failure")
        .otherwise("engagement")
    )
    return (
        ev.groupBy(cls.alias("event_class"))
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.coalesce(F.col("value"), F.lit(0)).cast("decimal(18,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("event_class")
    )


# Array functions over the embedding vectors (SURVEY.md §2.9 array surface):
# size / element access / element-wise transform + sequential fold. The
# fold order is positional in both engines, and float32→double casts are
# exact, so the L2 norm matches bit-for-bit (rounded defensively).
@_q(
    "scalar_array_embedding_norms",
    oracle="""
SELECT vec_id,
       CAST(LEN(embedding) AS INT) AS dim,
       ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_component,
       ROUND(SQRT(LIST_SUM(LIST_TRANSFORM(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm
FROM embeddings
ORDER BY vec_id
""",
)
def scalar_array_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.col("embedding"),
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("int").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_component"),
        F.round(F.sqrt(sq_sum), 6).alias("l2_norm"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# Map functions: parse the events.props JSON payload into a real MapType,
# explode to (key, value), aggregate per key. The map stays JVM-side
# (from_json → map_* / explode); no string re-parsing downstream.
# --------------------------------------------------------------------------
@_q(
    "scalar_map_props_stats",
    oracle="""
SELECT k.key AS prop_key,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.' || k.key) AS BIGINT)) AS BIGINT)
         AS value_sum,
       CAST(MIN(CAST(json_extract_string(props, '$.' || k.key) AS BIGINT)) AS BIGINT)
         AS value_min,
       CAST(MAX(CAST(json_extract_string(props, '$.' || k.key) AS BIGINT)) AS BIGINT)
         AS value_max
FROM events, UNNEST(json_keys(props)) AS k(key)
GROUP BY prop_key
ORDER BY prop_key
""",
)
def scalar_map_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select(F.explode(m).alias("prop_key", "value"))
        .groupBy("prop_key")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("value").cast("bigint").alias("value_sum"),
            F.min("value").cast("bigint").alias("value_min"),
            F.max("value").cast("bigint").alias("value_max"),
        )
        .orderBy("prop_key")
    )


# --------------------------------------------------------------------------
# Regex functions over part names: extract / replace / match with patterns
# kept in the common Java-regex ∩ RE2 subset so both engines agree.
# --------------------------------------------------------------------------
@_q(
    "scalar_regex_part_names",
    oracle="""
SELECT regexp_extract(p_name, '^[a-z]+') AS first_word,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(CASE WHEN regexp_matches(p_name, '[0-9]') THEN 1 ELSE 0 END) AS BIGINT)
         AS n_with_digit,
       CAST(SUM(LENGTH(regexp_replace(p_name, '[aeiou]', '', 'g'))) AS BIGINT)
         AS devoweled_len_sum
FROM part
GROUP BY first_word
ORDER BY first_word
""",
)
def scalar_regex_part_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    return (
        p.select(
            F.regexp_extract("p_name", "^[a-z]+", 0).alias("first_word"),
            F.col("p_name").rlike("[0-9]").cast("int").alias("has_digit"),
            F.length(F.regexp_replace("p_name", "[aeiou]", "")).alias("devoweled_len"),
        )
        .groupBy("first_word")
        .agg(
            F.count("*").cast("bigint").alias("n_parts"),
            F.sum("has_digit").cast("bigint").alias("n_with_digit"),
            F.sum("devoweled_len").cast("bigint").alias("devoweled_len_sum"),
        )
        .orderBy("first_word")
    )


# --------------------------------------------------------------------------
# VARIANT (Spark 4's semi-structured type — the open-format answer to
# schema-on-read JSON columns): build a nested JSON document in-plan,
# parse_json it into a real VariantType, then navigate with typed
# variant_get paths (object field, nested object, array index, map key)
# and try_variant_get for an absent path. Variant navigation is
# O(path) over the binary encoding — no re-parse per access, unlike
# get_json_object chains — which is why it's the 100 TB semi-structured
# path. The oracle computes the same facts DIRECTLY from the base
# columns, so the hash match certifies the construct→parse→navigate
# round-trip end-to-end rather than mirroring it.
# --------------------------------------------------------------------------
@_q(
    "scalar_variant_navigation",
    oracle="""
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(SUM(user_id % 7) AS BIGINT) AS tag1_sum,
       CAST(COUNT(CASE WHEN 1 = 0 THEN 1 END) AS BIGINT) AS n_missing,
       CAST(COUNT(DISTINCT 'fixed') AS BIGINT) AS n_distinct_schemas
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def scalar_variant_navigation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(F.col("event_type").alias("type")).alias("meta"),
            F.array(F.col("user_id"), F.col("user_id") % 7).alias("tags"),
            F.from_json("props", "map<string,bigint>").alias("props"),
        )
    )
    v = ev.select("event_type", F.parse_json(doc).alias("v"))
    nav = v.select(
        F.variant_get("v", "$.meta.type", "string").alias("vtype"),
        F.variant_get("v", "$.tags[1]", "bigint").alias("tag1"),
        F.variant_get("v", "$.props.k", "bigint").alias("k"),
        F.try_variant_get("v", "$.absent.path", "bigint").alias("missing"),
        F.schema_of_variant("v").alias("vschema"),
    )
    return (
        nav.groupBy(F.col("vtype").alias("event_type"))
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.sum("tag1").cast("bigint").alias("tag1_sum"),
            F.count("missing").cast("bigint").alias("n_missing"),
            F.countDistinct("vschema").cast("bigint").alias("n_distinct_schemas"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# Higher-order array function suite — the lambda-expression surface
# (exists / forall / filter / slice / sort + dedup), all JVM-side
# codegen, over the embedding vectors: per-vector predicates (any
# coordinate above a threshold, all finite-range), a filtered count, and
# order statistics from a sorted slice. DuckDB's list_* family mirrors
# each 1:1. Doubles only pass through per-element comparisons and an
# element pick — no cross-row float accumulation — so values hash
# exactly after the defensive round.
# --------------------------------------------------------------------------
@_q(
    "scalar_array_hof_suite",
    oracle="""
SELECT vec_id,
       LIST_COUNT(LIST_FILTER(embedding, x -> CAST(x AS DOUBLE) > 0.1))
         AS n_above,
       CAST(LEN(embedding) - LEN(LIST_DISTINCT(embedding)) AS BIGINT)
         AS n_dup_values,
       LIST_BOOL_OR(
         LIST_TRANSFORM(embedding, x -> CAST(x AS DOUBLE) > 0.25)) AS any_big,
       LIST_BOOL_AND(
         LIST_TRANSFORM(embedding, x -> ABS(CAST(x AS DOUBLE)) <= 1.0))
         AS all_unit,
       ROUND(CAST(LIST_SORT(embedding)[3] AS DOUBLE), 6) AS third_smallest
FROM embeddings
WHERE vec_id < 50
ORDER BY vec_id
""",
)
def scalar_array_hof_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings").where(F.col("vec_id") < 50)
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(F.filter(emb, lambda x: x.cast("double") > 0.1)).alias("n_above"),
        (F.size(emb) - F.size(F.array_distinct(emb)))
        .cast("bigint")
        .alias("n_dup_values"),
        F.exists(emb, lambda x: x.cast("double") > 0.25).alias("any_big"),
        F.forall(emb, lambda x: F.abs(x.cast("double")) <= 1.0).alias("all_unit"),
        F.round(
            F.element_at(F.array_sort(emb), 3).cast("double"), 6
        ).alias("third_smallest"),
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# URL parsing — the web-corpus provenance scalar family (every crawl
# pipeline partitions by host and dedups by normalized URL). URLs are
# synthesized deterministically from fixture columns, parsed with Spark's
# parse_url (HOST/PATH/QUERY/PROTOCOL), and the oracle recomputes each
# part CLOSED-FORM from the same columns — certifying the parser against
# ground truth rather than against another parser. Pure codegen scalar
# work; the only shuffle is the per-host rollup.
# --------------------------------------------------------------------------
@_q(
    "scalar_url_parse",
    oracle="""
WITH u AS (
  SELECT doc_id,
         'crawl' || CAST(doc_id % 7 AS VARCHAR) || '.example.com' AS host,
         '/docs/' || source || '/' || CAST(doc_id AS VARCHAR) AS path,
         'lang=' || lang AS query
  FROM documents
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_urls,
       CAST(COUNT(DISTINCT path) AS BIGINT) AS n_paths,
       CAST(SUM(CASE WHEN query = 'lang=en' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_english,
       MIN(path) AS first_path
FROM u
GROUP BY host
ORDER BY host
""",
)
def scalar_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://crawl"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(".example.com/docs/"),
        F.col("source"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
    )
    parsed = d.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY")).alias("query"),
    )
    return (
        parsed.groupBy("host")
        .agg(
            F.count("*").cast("bigint").alias("n_urls"),
            F.countDistinct("path").cast("bigint").alias("n_paths"),
            F.sum(F.when(F.col("query") == "lang=en", 1).otherwise(0))
            .cast("bigint")
            .alias("n_english"),
            F.min("path").alias("first_path"),
        )
        .orderBy("host")
    )


# --------------------------------------------------------------------------
# Error-safe TRY arithmetic — the ANSI-mode migration surface: under ANSI
# SQL semantics (Spark 4's default) division by zero and bad casts THROW,
# and the sanctioned fix is the try_* family, which yields NULL instead.
# Certified here against DuckDB's equivalents (NULLIF-guarded division,
# TRY_CAST, native out-of-bounds-NULL list indexing): try_divide hits a
# real zero denominator (l_quantity = 30 rows), try_cast fails on
# non-numeric strings, try_element_at probes past the end of a real
# array column. All per-row codegen — no shuffle beyond the final
# dimension-sized aggregate.
# --------------------------------------------------------------------------
@_q(
    "scalar_try_arithmetic",
    oracle="""
WITH li AS (
  SELECT l_returnflag,
         l_extendedprice / NULLIF(l_quantity - 30.0, 0.0) AS unit_margin,
         TRY_CAST(l_shipinstruct_like AS DOUBLE) AS parsed
  FROM (
    SELECT l_returnflag, l_extendedprice, l_quantity,
           CASE WHEN l_linenumber % 2 = 0
                THEN CAST(l_extendedprice AS VARCHAR)
                ELSE 'N/A' END AS l_shipinstruct_like
    FROM lineitem
  )
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN unit_margin IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_div_by_zero,
       CAST(SUM(CAST(COALESCE(unit_margin, 0.0) AS DECIMAL(18,6))) AS DOUBLE)
         AS margin_sum,
       CAST(SUM(CASE WHEN parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unparsed,
       CAST(SUM(CAST(COALESCE(parsed, 0.0) AS DECIMAL(18,6))) AS DOUBLE)
         AS parsed_sum
FROM li
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    raw = li.select(
        "l_returnflag",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - F.lit(30.0)
        ).alias("unit_margin"),
        F.when(
            F.col("l_linenumber") % 2 == 0,
            F.col("l_extendedprice").cast("string"),
        )
        .otherwise(F.lit("N/A"))
        .try_cast("double")
        .alias("parsed"),
    )
    return (
        raw.groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.sum(F.when(F.col("unit_margin").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_div_by_zero"),
            F.sum(
                F.coalesce(F.col("unit_margin"), F.lit(0.0)).cast(
                    "decimal(18,6)"
                )
            )
            .cast("double")
            .alias("margin_sum"),
            F.sum(F.when(F.col("parsed").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_unparsed"),
            F.sum(
                F.coalesce(F.col("parsed"), F.lit(0.0)).cast("decimal(18,6)")
            )
            .cast("double")
            .alias("parsed_sum"),
        )
        .orderBy("l_returnflag")
    )
