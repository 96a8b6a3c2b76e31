"""Dataset sampling / splitting operators (north star: training-data
pipelines need reproducible corpus slices — train/val/test splits,
per-class caps, debugging subsamples).

Everything here is *deterministic by content hash*, not seeded-RNG: a
hash-derived split is stable across engines, re-runs, partitionings, and
cluster sizes, which is exactly what a 100 TB training corpus needs (the
membership of the validation set must never depend on task scheduling).
Seeded alternatives (``df.sample``, ``df.sampleBy``, reservoir) exist in
Spark but are partitioning-sensitive, so the oracle-checkable hash forms
are the engine's primary surface.

Scale notes: both operators are embarrassingly parallel scans (split) or
one bounded window shuffle (stratified cap); neither materializes more
than the requested sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from aws_glue_data_lake_spark.queries.base import Registry, t
from aws_glue_data_lake_spark.queries.textops import TOKS_SQL, toks

REGISTRY = Registry()
_q = REGISTRY.query


# --------------------------------------------------------------------------
# Hash split: assign each document to train/val/test by a byte of
# md5(doc_id) — 80/10/10. Pure per-row projection (no shuffle, no state):
# adding data never reassigns existing rows, so the split is stable under
# incremental ingest. The query returns per-split counts + a membership
# checksum so the oracle verifies assignment, not just sizes.
# --------------------------------------------------------------------------
_SPLIT_EXPR = (
    "CASE WHEN _b < 204 THEN 'train' WHEN _b < 230 THEN 'val' ELSE 'test' END"
)


@_q(
    "sample_hash_split",
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS _b
  FROM documents
), tagged AS (
  SELECT doc_id, {_SPLIT_EXPR} AS split FROM h
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM tagged GROUP BY split ORDER BY split
""",
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    byte0 = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast(
        "int"
    )
    tagged = d.select("doc_id", byte0.alias("_b")).selectExpr(
        "doc_id", f"{_SPLIT_EXPR} AS split"
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Deterministic stratified cap: at most k rows per label, chosen by
# content-hash order (the hash replaces RNG so the sample is engine- and
# partitioning-independent). Physically the W1 top-k-per-group pattern:
# one shuffle on label, WindowGroupLimit prunes to k per partition before
# the exchange, so the post-shuffle volume is labels×k, not the corpus.
# --------------------------------------------------------------------------
_CAP_PER_LABEL = 50


@_q(
    "sample_stratified_cap",
    oracle=f"""
WITH ranked AS (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY label
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM embeddings
)
SELECT label, vec_id FROM ranked
WHERE rn <= {_CAP_PER_LABEL}
ORDER BY label, vec_id
""",
)
def sample_stratified_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    w = (
        Window.partitionBy("label")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
    )
    return (
        e.select("label", "vec_id", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _CAP_PER_LABEL)
        .select("label", "vec_id")
        .orderBy("label", "vec_id")
    )


# --------------------------------------------------------------------------
# Quality-weighted downsampling: keep each document with probability
# proportional to a quality score — the standard corpus-mixing move
# (upweight long/clean documents, downweight fragments) — but with the
# coin flip replaced by a content hash: keep iff U(doc) < p(doc), where
# U = md5(doc_id)[:6]/16^6 is a deterministic uniform in [0,1). Membership
# is reproducible across engines, partitionings, and re-runs, and the
# acceptance rate converges to E[p] without any RNG state. Pure per-row
# projection + one aggregate — no shuffle wider than the summary.
# --------------------------------------------------------------------------
_P_EXPR_SQL = "LEAST(GREATEST(ntok / 200.0, 0.1), 0.9)"


# --------------------------------------------------------------------------
# End-to-end corpus curation: the composition a real training-data pipeline
# runs nightly — exact dedup (keep the smallest doc_id per content hash) →
# quality gate (token-count floor) → deterministic train/val/test split —
# expressed as ONE declarative plan, so Catalyst fuses the stages: the
# dedup aggregate is the only wide shuffle, the gate and split are
# projections on its output. Per-split counts + id checksum make every
# stage's effect oracle-visible.
# --------------------------------------------------------------------------
_MIN_TOKENS = 10


@_q(
    "pipeline_corpus_curation",
    oracle=f"""
WITH canon AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), kept AS (
  SELECT d.doc_id
  FROM documents d JOIN canon ON canon.doc_id = d.doc_id
  WHERE LEN({TOKS_SQL}) >= {_MIN_TOKENS}
), h AS (
  SELECT doc_id,
         CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 2)) AS INT) AS _b
  FROM kept
), tagged AS (
  SELECT doc_id, {_SPLIT_EXPR} AS split FROM h
)
SELECT split,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS id_checksum
FROM tagged GROUP BY split ORDER BY split
""",
)
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    canon = d.groupBy(F.md5("text")).agg(F.min("doc_id").alias("doc_id"))
    kept = (
        d.join(canon.select("doc_id"), "doc_id")
        .where(F.size(toks()) >= _MIN_TOKENS)
        .select("doc_id")
    )
    byte0 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10
    ).cast("int")
    tagged = kept.select("doc_id", byte0.alias("_b")).selectExpr(
        "doc_id", f"{_SPLIT_EXPR} AS split"
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("doc_id").cast("bigint").alias("id_checksum"),
        )
        .orderBy("split")
    )


@_q(
    "sample_quality_weighted",
    oracle=f"""
WITH feat AS (
  SELECT doc_id, LEN({TOKS_SQL}) AS ntok,
         CAST(('0x' || SUBSTR(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
           / 16777216.0 AS u
  FROM documents
), tagged AS (
  SELECT doc_id, ntok, {_P_EXPR_SQL} AS p, u FROM feat
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(CASE WHEN u < p THEN 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN u < p THEN doc_id END) AS BIGINT) AS kept_checksum,
       ROUND(CAST(SUM(CAST(p AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS expected_rate
FROM tagged
""",
)
def sample_quality_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    ntok = F.size(toks())
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("bigint") / 16777216.0
    p = F.least(F.greatest(ntok / 200.0, F.lit(0.1)), F.lit(0.9))
    tagged = d.select(
        "doc_id", u.alias("u"), p.alias("p")
    )
    kept = F.col("u") < F.col("p")
    return tagged.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
        F.sum(F.when(kept, F.col("doc_id"))).cast("bigint").alias("kept_checksum"),
        F.round(
            F.sum(F.col("p").cast("decimal(18,6)")).cast("double") / F.count("*"),
            6,
        ).alias("expected_rate"),
    )


# --------------------------------------------------------------------------
# Source-mix rebalancing: training corpora are dominated by their largest
# source; the standard fix downsamples every source toward a target mix
# (uniform here — each source capped at the smallest source's size) with
# per-source keep rates. The coin is the same deterministic content hash
# as sample_quality_weighted, so the kept set is reproducible; rates come
# from exact counts inside the plan (one tiny aggregate broadcast-crossed
# onto the scan, no driver round trip).
# --------------------------------------------------------------------------
@_q(
    "sample_source_rebalance",
    oracle="""
WITH counts AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY source
), m AS (
  SELECT MIN(n) AS min_n FROM counts
), tagged AS (
  SELECT d.doc_id, d.source, c.n, m.min_n,
         CAST(('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
           / 16777216.0 AS u
  FROM documents d JOIN counts c USING (source) CROSS JOIN m
)
SELECT source,
       CAST(MAX(n) AS BIGINT) AS n_docs,
       ROUND(MAX(min_n * 1.0 / n), 6) AS keep_rate,
       CAST(COUNT(CASE WHEN u < min_n * 1.0 / n THEN 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN u < min_n * 1.0 / n THEN doc_id END) AS BIGINT)
         AS kept_checksum
FROM tagged
GROUP BY source
ORDER BY source
""",
)
def sample_source_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").alias("n"))
    m = counts.agg(F.min("n").alias("min_n"))
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("bigint") / 16777216.0
    rate = F.col("min_n") * 1.0 / F.col("n")
    kept = F.col("u") < rate
    tagged = (
        d.select("doc_id", "source", u.alias("u"))
        .join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(m))
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.max("n").cast("bigint").alias("n_docs"),
            F.round(F.max(rate), 6).alias("keep_rate"),
            F.count(F.when(kept, 1)).cast("bigint").alias("n_kept"),
            F.sum(F.when(kept, F.col("doc_id"))).cast("bigint").alias(
                "kept_checksum"
            ),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Temporal split — the leakage-free eval protocol for time-ordered data:
# everything before a cutoff trains, everything after evaluates (a hash
# split would leak future information into training). The cutoff is the
# 80% point of the time RANGE in exact integer µs (tmin + (tmax-tmin)*4//5)
# so both engines compute the identical boundary — no float percentile at
# the split point. The scalar span enters as a broadcast 1-row cross
# join; per-split stats shuffle a 2-value key. The user-overlap column
# measures train→eval contamination pressure (users active on both
# sides), the thing a temporal split exists to control.
# --------------------------------------------------------------------------
@_q(
    "sample_temporal_split",
    oracle="""
WITH e AS (
  SELECT user_id, CAST(EPOCH_US(ts) AS BIGINT) AS ts_us, value FROM events
),
span AS (
  SELECT MIN(ts_us) AS tmin,
         MIN(ts_us) + (MAX(ts_us) - MIN(ts_us)) * 4 // 5 AS cutoff
  FROM e
),
tagged AS (
  SELECT CASE WHEN ts_us <= cutoff THEN 'train' ELSE 'eval' END AS split,
         user_id, value
  FROM e, span
),
overlap AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_overlap_users FROM (
    SELECT user_id FROM tagged GROUP BY user_id
    HAVING COUNT(DISTINCT split) = 2
  )
)
SELECT t.split,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT t.user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(t.value AS DECIMAL(18,6))) AS DOUBLE) AS value_sum,
       o.n_overlap_users
FROM tagged t, overlap o
GROUP BY t.split, o.n_overlap_users
ORDER BY t.split
""",
)
def sample_temporal_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_glue_data_lake_spark.tables import ts_us_col

    ev = t(spark, sf_dir, "events")
    e = ev.select("user_id", ts_us_col(ev).alias("ts_us"), "value")
    # Integer `div`, not float `/`: a double quotient can land an ulp
    # under the exact integer and truncate differently than DuckDB's `//`.
    span = e.agg(F.min("ts_us").alias("tmin"), F.max("ts_us").alias("tmax")).select(
        F.expr("tmin + ((tmax - tmin) * 4) div 5").alias("cutoff")
    )
    tagged = e.crossJoin(F.broadcast(span)).select(
        F.when(F.col("ts_us") <= F.col("cutoff"), "train")
        .otherwise("eval")
        .alias("split"),
        "user_id",
        "value",
    )
    overlap = (
        tagged.groupBy("user_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") == 2)
        .agg(F.count("*").cast("bigint").alias("n_overlap_users"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.countDistinct("user_id").cast("bigint").alias("n_users"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("value_sum"),
        )
        .crossJoin(F.broadcast(overlap))
        .select("split", "n_events", "n_users", "value_sum", "n_overlap_users")
        .orderBy("split")
    )


# --------------------------------------------------------------------------
# Sequence-packing accounting — GPT-style concat-and-chunk: each source's
# documents are concatenated in doc_id order into one token stream and
# cut into fixed 1024-token training sequences. Reports, per source, the
# sequence count and how many documents straddle a cut (the boundary-
# crossing rate that motivates doc-aware packing). All window passes
# partition by source — embarrassingly parallel across sources, and
# within a source the running sum is one pass; at 100 TB the same query
# runs per (source, shard) with shard-local budgets.
# --------------------------------------------------------------------------
_SEQ_LEN = 1024


@_q(
    "sample_sequence_packing",
    oracle=f"""
WITH d AS (
  SELECT source, doc_id, LEN({TOKS_SQL}) AS n_tok FROM documents
),
pos AS (
  SELECT source, doc_id, n_tok,
         SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum_end
  FROM d
),
marked AS (
  SELECT source, n_tok, cum_end,
         (cum_end - n_tok) // {_SEQ_LEN} AS start_seq,
         CASE WHEN cum_end % {_SEQ_LEN} = 0
              THEN cum_end // {_SEQ_LEN} - 1
              ELSE cum_end // {_SEQ_LEN} END AS end_seq
  FROM pos
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(CAST(CEIL(SUM(n_tok) * 1.0 / {_SEQ_LEN}) AS BIGINT) AS BIGINT)
         AS n_sequences,
       CAST(SUM(CASE WHEN end_seq > start_seq THEN 1 ELSE 0 END) AS BIGINT)
         AS n_boundary_docs
FROM marked
GROUP BY source
ORDER BY source
""",
)
def sample_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from aws_glue_data_lake_spark.queries.textops import toks

    d = t(spark, sf_dir, "documents").select(
        "source", "doc_id", F.size(toks()).alias("n_tok")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = d.select(
        "source", "n_tok", F.sum("n_tok").over(w).alias("cum_end")
    )
    start_seq = F.expr(f"(cum_end - n_tok) div {_SEQ_LEN}")
    end_seq = F.when(
        F.col("cum_end") % _SEQ_LEN == 0,
        F.expr(f"cum_end div {_SEQ_LEN}") - 1,
    ).otherwise(F.expr(f"cum_end div {_SEQ_LEN}"))
    return (
        pos.select(
            "source",
            "n_tok",
            (end_seq > start_seq).cast("long").alias("crosses"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("total_tokens"),
            F.ceil(F.sum("n_tok") * 1.0 / _SEQ_LEN)
            .cast("bigint")
            .alias("n_sequences"),
            F.sum("crosses").cast("bigint").alias("n_boundary_docs"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Token/char-budget source mixing — the "data mixology" step that turns
# per-source weights into an actual corpus: each source contributes a
# greedy hash-ordered prefix of documents until its character budget is
# reached (the crossing document is included, so a source with enough
# data always covers its budget). The hash order replaces RNG per this
# module's convention, so the mix is engine- and partitioning-stable.
# One shuffle on source; the running sum rides that partitioning.
# --------------------------------------------------------------------------
_MIX_BUDGET_CHARS = 20_000


@_q(
    "sample_token_budget_mix",
    oracle=f"""
WITH ordered AS (
  SELECT source, doc_id, n_chars,
         COALESCE(SUM(n_chars) OVER (
           PARTITION BY source
           ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM documents
),
picked AS (
  SELECT * FROM ordered WHERE cum_before < {_MIX_BUDGET_CHARS}
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS chars_selected,
       ROUND(SUM(n_chars) * 1.0 / {_MIX_BUDGET_CHARS}, 6) AS budget_fill
FROM picked
GROUP BY source
ORDER BY source
""",
)
def sample_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ordered = d.select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("cum_before"),
    )
    return (
        ordered.where(F.col("cum_before") < _MIX_BUDGET_CHARS)
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_selected"),
            F.round(
                F.sum("n_chars") * 1.0 / _MIX_BUDGET_CHARS, 6
            ).alias("budget_fill"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Temperature-based source mixing (α = 0.5) — the multilingual/multi-
# source LM sampling standard: sampling mass ∝ N_s^α, realized as a
# per-document keep rate r_s = (N_min / N_s)^(1-α) (the smallest source
# keeps everything, larger sources shrink toward sqrt scaling — no
# upsampling, so it stays a pure filter). Membership is hash-derandomized
# (md5 prefix as a uniform in [0, 16^6)) against an INTEGER threshold
# floor(r_s·16^6), so the cut is an exact integer compare — no float
# boundary to disagree on — and any subset/shard of the corpus makes the
# same decisions. Source counts broadcast; the corpus pass is one
# filtered scan.
# ---------------------------------------------------------------------------
@_q(
    "sample_temperature_mix",
    oracle="""
WITH counts AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total FROM documents GROUP BY source
),
thr AS (
  SELECT source, n_total,
         CAST(FLOOR(SQRT(CAST((SELECT MIN(n_total) FROM counts) AS DOUBLE)
                         / n_total) * 16777216) AS BIGINT) AS threshold
  FROM counts
),
kept AS (
  SELECT d.source,
         CAST(('0x' || SUBSTR(md5(CAST(d.doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
           AS h
  FROM documents d
)
SELECT t.source, t.n_total, t.threshold,
       CAST(SUM(CASE WHEN k.h < t.threshold THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM kept k JOIN thr t USING (source)
GROUP BY t.source, t.n_total, t.threshold
ORDER BY t.source
""",
)
def sample_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("source").agg(F.count("*").cast("bigint").alias("n_total"))
    nmin = counts.agg(F.min("n_total").alias("n_min"))
    thr = counts.crossJoin(F.broadcast(nmin)).select(
        "source",
        "n_total",
        F.floor(
            F.sqrt(F.col("n_min").cast("double") / F.col("n_total"))
            * F.lit(16_777_216)
        )
        .cast("bigint")
        .alias("threshold"),
    )
    h = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10
    ).cast("bigint")
    kept = d.select("source", h.alias("h"))
    return (
        kept.join(F.broadcast(thr), "source")
        .groupBy("source", "n_total", "threshold")
        .agg(
            F.sum((F.col("h") < F.col("threshold")).cast("long"))
            .cast("bigint")
            .alias("n_kept")
        )
        .select("source", "n_total", "threshold", "n_kept")
        .orderBy("source")
    )
