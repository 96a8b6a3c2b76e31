"""Text-analysis operators over ``documents`` (north star; SURVEY.md §7
Phase 4): token counting, quality scoring, language-ID, document
fingerprinting, tf-idf. The reference has no text surface (SURVEY.md §2.9 —
its only string ops are driver-side Python), so these are engine additions
for the LLM-data-pipeline tier.

Everything stays JVM-side (`split`/`filter`/`transform`/`aggregate`/
`explode` — no Python UDFs in the hot path) so the plans whole-stage-codegen
and scale linearly with document bytes. Cross-engine determinism: tokens are
non-empty single-space splits; hashes are md5 hex strings (identical in
Spark and DuckDB); doubles are rounded to 6.

Scale notes (100 TB design point): every query here is embarrassingly
parallel per-document except tf-idf, whose document-frequency aggregate is
one shuffle over distinct (term) — bounded by vocabulary size, not corpus
size, after the map-side distinct-per-doc explode.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_glue_data_lake_spark.queries.base import Registry, t

REGISTRY = Registry()
_q = REGISTRY.query

# Shared token definition: split on single space, drop empties.
# DuckDB twin: LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')
TOKS_SQL = "LIST_FILTER(STRING_SPLIT(text, ' '), x -> x <> '')"


def toks(col: Column = None) -> Column:
    c = col if col is not None else F.col("text")
    return F.filter(F.split(c, " "), lambda x: x != "")


def bigrams(tk: Column) -> Column:
    """All word bigrams in positional order, duplicates kept — zip_with
    self-shift, same rationale as trigrams()."""
    n = F.size(tk)
    g2 = F.zip_with(
        tk,
        F.slice(tk, 2, F.greatest(n, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return F.slice(g2, 1, F.greatest(n - 1, F.lit(0)))


def trigrams(tk: Column) -> Column:
    """All word trigrams in positional order, duplicates kept, built by
    zipping the token array with its own 1-/2-shifted slices. The naive
    ``transform(sequence, i -> element_at(tk, i)...)`` form re-evaluates
    the inlined tokenizer per element (Catalyst inlines projected columns
    into every reference and CSE can't reach inside HOF lambdas) — O(n²)
    splits per document; this form evaluates it once per row."""
    n = F.size(tk)
    rest = lambda k: F.slice(tk, k, F.greatest(n - (k - 2), F.lit(0)))
    g2 = F.zip_with(tk, rest(2), lambda a, b: F.concat_ws(" ", a, b))
    g3 = F.zip_with(g2, rest(3), lambda a, b: F.concat_ws(" ", a, b))
    return F.when(
        n >= 3, F.slice(g3, 1, F.greatest(n - 2, F.lit(0)))
    ).otherwise(F.array().cast("array<string>"))


def ngrams(tk: Column, width: int) -> Column:
    """All word ``width``-grams in positional order, duplicates kept — the
    generalization of trigrams() to any width via the same zip_with
    self-shift chain (one tokenizer evaluation per row; see trigrams() on
    the HOF inlining trap). zip_with pads the shorter side with nulls and
    concat_ws skips them, so the partial tail grams are sliced off."""
    n = F.size(tk)
    rest = lambda k: F.slice(tk, k, F.greatest(n - (k - 2), F.lit(0)))
    g = tk
    for k in range(2, width + 1):
        g = F.zip_with(g, rest(k), lambda a, b: F.concat_ws(" ", a, b))
    return F.when(
        n >= width, F.slice(g, 1, F.greatest(n - (width - 1), F.lit(0)))
    ).otherwise(F.array().cast("array<string>"))


# Tiny stopword list shared with the oracle (subset of the fixture vocab).
STOPWORDS = ("the", "a", "of", "and", "to")
_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"


# --------------------------------------------------------------------------
# Token counting — whitespace tokens plus a BPE-ish subword estimate
# (ceil(chars/4), the common chars-per-token heuristic). Per-language
# aggregate: one narrow shuffle on a 5-value key.
# --------------------------------------------------------------------------
@_q(
    "text_token_stats",
    oracle=f"""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(LEN({TOKS_SQL})) AS BIGINT) AS total_tokens,
       ROUND(SUM(LEN({TOKS_SQL})) * 1.0 / COUNT(*), 6) AS avg_tokens_per_doc,
       CAST(SUM(CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT)) AS BIGINT) AS total_subword_est,
       ROUND(SUM(LENGTH(REPLACE(text, ' ', ''))) * 1.0 / SUM(LEN({TOKS_SQL})), 6)
         AS avg_token_len
FROM documents
GROUP BY lang
ORDER BY lang
""",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n_tok = F.size(toks())
    return (
        d.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok).cast("bigint").alias("total_tokens"),
            F.round(F.sum(n_tok) * 1.0 / F.count("*"), 6).alias("avg_tokens_per_doc"),
            F.sum(F.ceil(F.length("text") / 4.0).cast("bigint"))
            .cast("bigint")
            .alias("total_subword_est"),
            F.round(
                F.sum(F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
                * 1.0
                / F.sum(n_tok),
                6,
            ).alias("avg_token_len"),
        )
        .orderBy("lang")
    )


# --------------------------------------------------------------------------
# Quality scoring — per-document heuristics an LLM-data pipeline filters on:
# length, lexical diversity (distinct/total tokens), stopword ratio, and a
# composite keep-score. Pure per-row map stage: no shuffle except the
# deterministic ORDER BY for the oracle compare.
# --------------------------------------------------------------------------
@_q(
    "text_quality_scores",
    oracle=f"""
WITH feat AS (
  SELECT doc_id,
         LENGTH(text) AS n_chars,
         LEN({TOKS_SQL}) AS n_tokens,
         LEN(LIST_DISTINCT({TOKS_SQL})) AS n_distinct_tokens,
         LEN(LIST_FILTER({TOKS_SQL}, x -> x IN {_STOP_SQL})) AS n_stopwords
  FROM documents
)
SELECT doc_id,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(n_distinct_tokens * 1.0 / n_tokens, 6) AS lexical_diversity,
       ROUND(n_stopwords * 1.0 / n_tokens, 6) AS stopword_ratio,
       CASE WHEN n_tokens >= 20
             AND n_distinct_tokens * 1.0 / n_tokens >= 0.3
            THEN 1 ELSE 0 END AS keep_flag
FROM feat
ORDER BY doc_id
""",
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = toks()
    n_tokens = F.size(tk)
    n_distinct = F.size(F.array_distinct(tk))
    n_stop = F.size(F.filter(tk, lambda x: x.isin(*STOPWORDS)))
    diversity = n_distinct * 1.0 / n_tokens
    return (
        d.select(
            "doc_id",
            F.length("text").cast("bigint").alias("n_chars"),
            n_tokens.cast("bigint").alias("n_tokens"),
            F.round(diversity, 6).alias("lexical_diversity"),
            F.round(n_stop * 1.0 / n_tokens, 6).alias("stopword_ratio"),
            F.when((n_tokens >= 20) & (diversity >= 0.3), 1)
            .otherwise(0)
            .alias("keep_flag"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# Language-ID — marker-token profile scoring (the n-gram-heuristic family:
# score each language by marker hits, argmax with a fixed tiebreak order).
# Reported as a (actual_lang, predicted_lang) confusion matrix so the result
# is small regardless of corpus size. Per-row scoring → 25-cell aggregate.
# --------------------------------------------------------------------------
_MARKERS = {
    "en": ("the", "a", "and", "scan", "merge"),
    "de": ("der", "und", "die", "window", "batch"),
    "es": ("el", "la", "de", "query", "table"),
    "fr": ("le", "la", "et", "stream", "join"),
    "zh": ("spark", "data", "row", "hash", "key"),
}


def _marker_sql(lang: str) -> str:
    lst = "('" + "', '".join(_MARKERS[lang]) + "')"
    return f"LEN(LIST_FILTER({TOKS_SQL}, x -> x IN {lst}))"


@_q(
    "text_language_id",
    oracle=f"""
WITH scored AS (
  SELECT lang,
         {_marker_sql('en')} AS s_en,
         {_marker_sql('de')} AS s_de,
         {_marker_sql('es')} AS s_es,
         {_marker_sql('fr')} AS s_fr,
         {_marker_sql('zh')} AS s_zh
  FROM documents
), pred AS (
  SELECT lang,
         CASE GREATEST(s_en, s_de, s_es, s_fr, s_zh)
           WHEN s_en THEN 'en' WHEN s_de THEN 'de' WHEN s_es THEN 'es'
           WHEN s_fr THEN 'fr' ELSE 'zh' END AS predicted_lang
  FROM scored
)
SELECT lang AS actual_lang, predicted_lang, COUNT(*) AS n_docs
FROM pred
GROUP BY lang, predicted_lang
ORDER BY actual_lang, predicted_lang
""",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = toks()
    # NB: a two-arg lambda would be treated as (element, index) by F.filter,
    # so bind the marker list through an outer closure instead.
    def _marker_count(markers):
        return F.size(F.filter(tk, lambda x: x.isin(*markers)))

    scores = {lang: _marker_count(m) for lang, m in _MARKERS.items()}
    best = F.greatest(*scores.values())
    # Same fixed tie-break order as the oracle CASE: en, de, es, fr, else zh.
    pred = (
        F.when(scores["en"] == best, "en")
        .when(scores["de"] == best, "de")
        .when(scores["es"] == best, "es")
        .when(scores["fr"] == best, "fr")
        .otherwise("zh")
    )
    return (
        d.select(F.col("lang").alias("actual_lang"), pred.alias("predicted_lang"))
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("actual_lang", "predicted_lang")
    )


# --------------------------------------------------------------------------
# Document fingerprinting — (a) order-insensitive bag-of-words fingerprint
# (md5 of the sorted distinct token list) for exact-content dedup keys, and
# (b) a winnowing-style selected shingle hash (min md5 over word 3-grams),
# the rolling-hash fingerprint family. Per-row map; md5 is identical across
# engines so fingerprints are portable join keys.
# --------------------------------------------------------------------------
@_q(
    "text_fingerprint",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, {TOKS_SQL} AS toks FROM documents
), sh AS (
  SELECT doc_id, toks,
         CASE WHEN LEN(toks) >= 3 THEN
           LIST_TRANSFORM(generate_series(1, LEN(toks) - 2),
                          i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
         ELSE [] END AS shingle_hashes
  FROM tk
)
SELECT doc_id,
       md5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(toks)), ' ')) AS bow_fingerprint,
       LIST_MIN(shingle_hashes) AS min_shingle_hash,
       CAST(LEN(shingle_hashes) AS BIGINT) AS n_shingles
FROM sh
ORDER BY doc_id
""",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = toks()
    shingles = F.transform(trigrams(F.col("toks")), lambda x: F.md5(x))
    return (
        d.select("doc_id", tk.alias("toks"))
        .select(
            "doc_id",
            F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("toks")))).alias(
                "bow_fingerprint"
            ),
            F.array_min(shingles).alias("min_shingle_hash"),
            F.size(shingles).cast("bigint").alias("n_shingles"),
        )
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# tf-idf top terms — explode distinct-per-doc tokens for document frequency,
# total term frequency from the raw explode; idf = ln(N/df). Two shuffles,
# both keyed on term (vocabulary-bounded, not corpus-bounded). Top-20 with
# term as the unique tiebreaker.
# --------------------------------------------------------------------------
@_q(
    "text_tfidf_top_terms",
    oracle=f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
tf AS (
  SELECT t.term, COUNT(*) AS term_freq
  FROM (SELECT UNNEST({TOKS_SQL}) AS term FROM documents) t
  GROUP BY t.term
),
df AS (
  SELECT t.term, COUNT(*) AS doc_freq
  FROM (SELECT DISTINCT doc_id, UNNEST({TOKS_SQL}) AS term FROM documents) t
  GROUP BY t.term
)
SELECT tf.term,
       CAST(tf.term_freq AS BIGINT) AS term_freq,
       CAST(df.doc_freq AS BIGINT) AS doc_freq,
       ROUND(tf.term_freq * LN(n.n_docs * 1.0 / df.doc_freq), 6) AS tfidf
FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
ORDER BY tfidf DESC, tf.term
LIMIT 20
""",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    exploded = d.select("doc_id", F.explode(toks()).alias("term"))
    # Corpus size stays IN the plan as a 1-row aggregate broadcast-crossed
    # onto the term table — no driver-side d.count() job, so the whole
    # query is one Spark job and N is computed from the same snapshot of
    # the input as the term stats.
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    tf = exploded.groupBy("term").agg(F.count("*").cast("bigint").alias("term_freq"))
    df_ = (
        exploded.distinct()
        .groupBy("term")
        .agg(F.count("*").cast("bigint").alias("doc_freq"))
    )
    return (
        tf.join(df_, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "term",
            "term_freq",
            "doc_freq",
            F.round(
                F.col("term_freq") * F.log(F.col("n_docs") / F.col("doc_freq")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.desc("tfidf"), "term")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Bigram frequencies — the n-gram statistic LM-data work leans on for
# boilerplate detection and corpus fingerprinting. Adjacent-pair explode is
# a per-row map; the count shuffle is keyed on the bigram (vocabulary²-
# bounded in principle, Zipf-bounded in practice); top-k via the ranked
# limit, bigram itself as the tiebreaker.
# --------------------------------------------------------------------------
@_q(
    "text_top_bigrams",
    oracle=f"""
WITH tk AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
bg AS (
  SELECT UNNEST(LIST_TRANSFORM(generate_series(1, LEN(t) - 1),
                               i -> t[i] || ' ' || t[i+1])) AS bigram
  FROM tk WHERE LEN(t) >= 2
)
SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM bg
GROUP BY bigram
ORDER BY n_occurrences DESC, bigram
LIMIT 20
""",
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = toks()
    n = F.size(tk)
    return (
        d.where(n >= 2)
        .select(F.explode(bigrams(tk)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), "bigram")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# §2.11's second UDF surface: a VECTORIZED pandas UDF registered by NAME
# into the SQL function catalog (spark.udf.register) and called from a SQL
# string — the path a SQL-only engine user takes, distinct from the
# column-API pandas_udf/mapInPandas family the similarity/multimodal
# queries exercise. The body stays Arrow-batched (Series.str.count, no
# per-row Python), so registration changes the call surface, not the
# execution profile; at 100 TB the UDF runs inside the scan's codegen
# stage with Arrow transfer exactly like its column-API twin.
# ---------------------------------------------------------------------------
@_q(
    "text_sql_registered_udf",
    oracle=r"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
       CAST(MAX(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS max_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
""",
)
def text_sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from aws_glue_data_lake_spark.tables import register_views

    @pandas_udf("bigint")
    def _token_count(s: pd.Series) -> pd.Series:
        # \S+ runs ≡ whitespace-separated tokens; mirrors the oracle's
        # regexp_extract_all length. documents.text is non-null by fixture
        # contract, so the int64 cast is total.
        return s.str.count(r"\S+").astype("int64")

    spark.udf.register("token_count", _token_count)
    register_views(spark, sf_dir, names=("documents",))
    return spark.sql(
        """
        SELECT source,
               CAST(SUM(token_count(text)) AS BIGINT) AS total_tokens,
               CAST(MAX(token_count(text)) AS BIGINT) AS max_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents
        GROUP BY source
        ORDER BY source
        """
    )


# ---------------------------------------------------------------------------
# BPE-ish subword token counting — the tokenizer-shaped budget estimate an
# LLM data pipeline runs over every corpus slice (context-length planning,
# per-source token accounting) without paying for a real BPE vocab. The
# pattern is the GPT-2 pre-tokenizer family with the lookahead dropped
# (RE2 has no lookahead, and Java/RE2 agree on leftmost-first alternation
# + greedy runs, so Spark and DuckDB tokenize identically — probed on
# mixed text before pinning). Pure JVM codegen regex (regexp_extract_all
# + size): no UDF, no Arrow hop; at 100 TB this runs inside the scan's
# whole-stage codegen with only the final per-source agg shuffling.
# Whitespace is an explicit character class, not \s: Java's \s includes
# \x0B where RE2's does not, so the cross-engine identity would otherwise
# hold only fixture-by-fixture instead of by construction.
# ---------------------------------------------------------------------------
_BPE_WS = r" \t\n\r\f"
_BPE_RE = (
    rf" ?\p{{L}}+| ?\p{{N}}+| ?[^{_BPE_WS}\p{{L}}\p{{N}}]+|[{_BPE_WS}]+"
)


@_q(
    "text_bpe_token_count",
    oracle=f"""
SELECT source,
       CAST(SUM(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
         AS total_subtokens,
       CAST(MAX(len(regexp_extract_all(text, '{_BPE_RE}'))) AS BIGINT)
         AS max_subtokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY source
ORDER BY source
""",
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    n_sub = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), F.lit(0)))
    return (
        d.groupBy("source")
        .agg(
            F.sum(n_sub).cast("bigint").alias("total_subtokens"),
            F.max(n_sub).cast("bigint").alias("max_subtokens"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination — the training-data pass that flags corpus
# documents sharing any word trigram with a held-out eval set (here: every
# 97th document stands in for the benchmark). Scale shape: the eval side
# is benchmark-sized (thousands of documents, MBs of distinct n-grams), so
# its distinct-gram set is BROADCAST and the corpus side never shuffles —
# each scan task probes the in-memory gram set and the only exchange is
# the final per-source aggregate. At 100 TB the broadcast is the same
# (eval sets don't grow with the corpus); a Bloom filter over the grams is
# the drop-in refinement if the exact set outgrows memory.
# ---------------------------------------------------------------------------
_EVAL_MOD = 97

_TRIGRAM_SQL = f"""CASE WHEN LEN({TOKS_SQL}) >= 3 THEN
  LIST_TRANSFORM(generate_series(1, LEN({TOKS_SQL}) - 2),
    i -> {TOKS_SQL}[i] || ' ' || {TOKS_SQL}[i+1] || ' ' || {TOKS_SQL}[i+2])
  ELSE [] END"""


@_q(
    "text_decontaminate_overlap",
    oracle=f"""
WITH tg AS (
  SELECT doc_id, source, UNNEST(LIST_DISTINCT({_TRIGRAM_SQL})) AS g
  FROM documents
), eval_grams AS (
  SELECT DISTINCT g FROM tg WHERE doc_id % {_EVAL_MOD} = 0
), corpus AS (
  SELECT DISTINCT doc_id, source FROM documents WHERE doc_id % {_EVAL_MOD} <> 0
), contaminated AS (
  SELECT DISTINCT t.doc_id, t.source
  FROM tg t JOIN eval_grams e USING (g)
  WHERE t.doc_id % {_EVAL_MOD} <> 0
)
SELECT c.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(x.doc_id) AS BIGINT) AS n_contaminated
FROM corpus c LEFT JOIN contaminated x ON c.doc_id = x.doc_id
GROUP BY c.source
ORDER BY c.source
""",
)
def text_decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    grams = d.select(
        "doc_id",
        "source",
        F.explode(F.array_distinct(trigrams(toks()))).alias("g"),
    )
    eval_grams = (
        grams.where(F.col("doc_id") % _EVAL_MOD == 0).select("g").distinct()
    )
    corpus = d.where(F.col("doc_id") % _EVAL_MOD != 0)
    contaminated = (
        grams.where(F.col("doc_id") % _EVAL_MOD != 0)
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        # DISTINCT mirrors the oracle's `SELECT DISTINCT doc_id, source` so
        # the count stays right even if a producer emits duplicate doc_ids.
        corpus.select("doc_id", "source")
        .distinct()
        .join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count("hit").cast("bigint").alias("n_contaminated"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Repetition / quality signals per document — the Gopher-style rules a
# training-data pipeline gates on (C4/Gopher/RefinedWeb all filter on
# repetition): distinct-word ratio, most-frequent-word dominance, and the
# duplicate-bigram fraction. Scale shape: the array-local stats (sizes,
# distinct sizes) are computed scan-side with zero shuffle; only the
# top-word count needs a real aggregation, and its shuffle is keyed on
# (doc_id, word) with map-side partial counts — never on the raw text.
# ---------------------------------------------------------------------------
_BIGRAM_LIST_SQL = (
    "CASE WHEN LEN(t) >= 2 THEN LIST_TRANSFORM("
    "generate_series(1, LEN(t) - 1), i -> t[i] || ' ' || t[i+1]) "
    "ELSE [] END"
)


@_q(
    "text_repetition_signals",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST({TOKS_SQL}) AS w FROM documents
),
wc AS (
  SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w
),
words AS (
  SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         COUNT(*) AS n_distinct, MAX(c) AS top_c
  FROM wc GROUP BY doc_id
),
bg AS (
  SELECT doc_id, LEN({_BIGRAM_LIST_SQL}) AS nb,
         LEN(LIST_DISTINCT({_BIGRAM_LIST_SQL})) AS ndb
  FROM (SELECT doc_id, {TOKS_SQL} AS t FROM documents)
)
SELECT w.doc_id,
       w.n_tokens,
       ROUND(w.n_distinct * 1.0 / w.n_tokens, 6) AS distinct_ratio,
       ROUND(w.top_c * 1.0 / w.n_tokens, 6) AS top_word_frac,
       CASE WHEN b.nb > 0 THEN ROUND(1.0 - b.ndb * 1.0 / b.nb, 6)
            ELSE 0.0 END AS dup_bigram_frac
FROM words w JOIN bg b ON w.doc_id = b.doc_id
ORDER BY w.doc_id
""",
)
def text_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", toks().alias("tk"))
    arr = d.select(
        "doc_id",
        F.size(bigrams(F.col("tk"))).alias("nb"),
        F.size(F.array_distinct(bigrams(F.col("tk")))).alias("ndb"),
    )
    wc = (
        d.select("doc_id", F.explode("tk").alias("w"))
        .groupBy("doc_id", "w")
        .count()
    )
    words = wc.groupBy("doc_id").agg(
        F.sum("count").cast("bigint").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.max("count").alias("top_c"),
    )
    return (
        words.join(arr, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("n_distinct") * 1.0 / F.col("n_tokens"), 6).alias(
                "distinct_ratio"
            ),
            F.round(F.col("top_c") * 1.0 / F.col("n_tokens"), 6).alias(
                "top_word_frac"
            ),
            F.when(
                F.col("nb") > 0,
                F.round(1.0 - F.col("ndb") * 1.0 / F.col("nb"), 6),
            )
            .otherwise(0.0)
            .alias("dup_bigram_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Cross-document passage detection — exact copy-paste passages shared by
# ≥ 2 documents (the passage-granular twin of document-level dedup, and
# the standard way boilerplate/licenses/templates surface in a web
# corpus). Passages are non-overlapping 3-token chunks (stride 3 over the
# O(n) trigram builder — the chunking itself never re-tokenizes). Scale
# shape: one shuffle keyed on the passage, map-side partial counts, top-k
# via TakeOrdered; no self-join anywhere, so cost is O(total tokens).
# ---------------------------------------------------------------------------
@_q(
    "text_common_passages",
    oracle=f"""
WITH ch AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(
           generate_series(1, GREATEST(LEN(t) - 2, 0), 3),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS passage
  FROM (SELECT doc_id, {TOKS_SQL} AS t FROM documents)
)
SELECT passage,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM ch
GROUP BY passage
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occurrences DESC, passage
LIMIT 20
""",
)
def text_common_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    # Trigram j (0-based) covers tokens j+1..j+3; keeping j % 3 == 0 gives
    # the non-overlapping stride-3 chunking, mirroring the oracle's
    # generate_series(1, len-2, 3) 1-based stride.
    chunks = F.filter(trigrams(toks()), lambda x, i: i % 3 == 0)
    return (
        d.select("doc_id", F.explode(chunks).alias("passage"))
        .groupBy("passage")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count("*").cast("bigint").alias("n_occurrences"),
        )
        .where(F.col("n_docs") >= 2)
        .orderBy(F.desc("n_docs"), F.desc("n_occurrences"), "passage")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Quality-gate funnel — the C4/Gopher-style filter cascade every corpus
# curation run reports: how many documents survive each successive gate
# (token-count band → repetition ceiling → stopword floor → language).
# One scan computes every per-doc flag array-locally; the funnel is a
# single 1-row aggregate of cumulative conjunctions, unpivoted to one row
# per stage — so the whole report costs one pass over the corpus and
# shuffles five numbers, at any scale. Gates are ANDed in order, so each
# row is "survivors through stage k" (monotonically non-increasing).
# ---------------------------------------------------------------------------
_FUNNEL_STAGES = ("total", "token_count", "repetition", "stopword", "language")


@_q(
    "pipeline_quality_filter_funnel",
    oracle=f"""
WITH d AS (
  SELECT doc_id, lang, {TOKS_SQL} AS t FROM documents
),
m AS (
  SELECT lang,
         LEN(t) AS n_tok,
         LEN(LIST_FILTER(t, x -> x IN {_STOP_SQL})) AS n_stop,
         CASE WHEN LEN(t) >= 2 THEN
           1.0 - LEN(LIST_DISTINCT({_BIGRAM_LIST_SQL})) * 1.0 / (LEN(t) - 1)
         ELSE 0.0 END AS dup_frac
  FROM d
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS s0,
         CAST(SUM(CASE WHEN n_tok BETWEEN 20 AND 80
                       THEN 1 ELSE 0 END) AS BIGINT) AS s1,
         CAST(SUM(CASE WHEN n_tok BETWEEN 20 AND 80 AND dup_frac <= 0.05
                       THEN 1 ELSE 0 END) AS BIGINT) AS s2,
         CAST(SUM(CASE WHEN n_tok BETWEEN 20 AND 80 AND dup_frac <= 0.05
                        AND n_stop >= 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS s3,
         CAST(SUM(CASE WHEN n_tok BETWEEN 20 AND 80 AND dup_frac <= 0.05
                        AND n_stop >= 1 AND lang = 'en'
                       THEN 1 ELSE 0 END) AS BIGINT) AS s4
  FROM m
)
SELECT 0 AS stage, 'total' AS gate, s0 AS n_docs FROM g
UNION ALL SELECT 1, 'token_count', s1 FROM g
UNION ALL SELECT 2, 'repetition', s2 FROM g
UNION ALL SELECT 3, 'stopword', s3 FROM g
UNION ALL SELECT 4, 'language', s4 FROM g
ORDER BY stage
""",
)
def pipeline_quality_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", toks().alias("tk")
    )
    n_tok = F.size("tk")
    n_stop = F.size(F.filter(F.col("tk"), lambda x: x.isin(*STOPWORDS)))
    dup_frac = F.when(
        n_tok >= 2,
        1.0
        - F.size(F.array_distinct(bigrams(F.col("tk")))) * 1.0 / (n_tok - 1),
    ).otherwise(0.0)
    gates = [
        F.lit(True),
        n_tok.between(20, 80),
    ]
    gates.append(gates[1] & (dup_frac <= 0.05))
    gates.append(gates[2] & (n_stop >= 1))
    gates.append(gates[3] & (F.col("lang") == "en"))
    agg = d.agg(
        *[
            F.sum(g.cast("long")).cast("bigint").alias(f"s{i}")
            for i, g in enumerate(gates)
        ]
    )
    stack = ", ".join(
        f"{i}, '{name}', s{i}" for i, name in enumerate(_FUNNEL_STAGES)
    )
    return agg.selectExpr(
        f"stack({len(_FUNNEL_STAGES)}, {stack}) AS (stage, gate, n_docs)"
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# Unigram-LM likelihood scoring — the perplexity-proxy filter (the KenLM
# step of a web-corpus pipeline, reduced to its distributed skeleton): fit
# a corpus unigram LM (one word-count aggregate), score every document by
# its mean token log-probability, and surface the 20 least-likely docs —
# the OOD/noise tail a curation pipeline would drop. Scale shape: the LM
# is vocabulary-bounded (not corpus-bounded) after the map-side partial
# agg, so it BROADCASTS into the scoring join — the corpus side never
# shuffles on the (heavily skewed) word key; if the vocabulary outgrew the
# broadcast ceiling the fallback is the salted-join pattern pinned in
# tests/test_plans.py. Determinism: each ln(p) is cast to DECIMAL(18,6)
# before summing (order-independent; half-ulp libm divergence would need
# to land within an ulp of a 0.5e-6 boundary to matter), and the top-k
# carries the doc_id tiebreak.
# ---------------------------------------------------------------------------
@_q(
    "text_unigram_logprob",
    oracle=f"""
WITH tok AS (
  SELECT doc_id, UNNEST({TOKS_SQL}) AS word FROM documents
),
lm AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY word
),
tot AS (
  SELECT CAST(SUM(c) AS DOUBLE) AS n FROM lm
),
scored AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         ROUND(CAST(SUM(CAST(LN(CAST(lm.c AS DOUBLE) / tot.n)
                   AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
           AS mean_logprob
  FROM tok t JOIN lm USING (word) CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens, mean_logprob
FROM scored
ORDER BY mean_logprob, doc_id
LIMIT 20
""",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", toks().alias("tk"))
    tok = d.select("doc_id", F.explode("tk").alias("word"))
    lm = tok.groupBy("word").agg(F.count("*").cast("bigint").alias("c"))
    tot = lm.agg(F.sum("c").cast("double").alias("n"))
    scored = (
        tok.join(F.broadcast(lm), "word")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            "lp",
            F.log(F.col("c").cast("double") / F.col("n")).cast("decimal(18,6)"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum("lp").cast("double") / F.count("*"), 6).alias(
                "mean_logprob"
            ),
        )
    )
    return scored.select("doc_id", "n_tokens", "mean_logprob").orderBy(
        "mean_logprob", "doc_id"
    ).limit(20)


# ---------------------------------------------------------------------------
# PII redaction — the scrub step of a training-data pipeline. The fixture
# corpus is synthetic and PII-free, so deterministic synthetic PII is
# injected FIRST (identically on both engine sides, keyed off doc_id — the
# injection is fixture augmentation, the operator under test is the
# redaction kernel): every 3rd doc gains an email, every 5th a phone
# number. Redaction is regexp_replace with dialect-safe patterns (plain
# character classes — no \\d, \\b, or lookaround, so Java regex and RE2
# agree by construction). Pure codegen scan→project→agg: embarrassingly
# parallel per document, one 20-group shuffle, at any scale.
# ---------------------------------------------------------------------------
_EMAIL_RE = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
_PHONE_RE = "555-[0-9]{4}"


@_q(
    "text_pii_redaction",
    oracle=f"""
WITH aug AS (
  SELECT source,
         text
           || CASE WHEN doc_id % 3 = 0
                THEN ' contact user' || doc_id || '@example.com now'
                ELSE '' END
           || CASE WHEN doc_id % 5 = 0
                THEN ' call 555-' || LPAD(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END AS text
  FROM documents
),
red AS (
  SELECT source,
         LENGTH(text) AS raw_len,
         LENGTH(REGEXP_REPLACE(REGEXP_REPLACE(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                               '{_PHONE_RE}', '<PHONE>', 'g')) AS red_len,
         LEN(REGEXP_EXTRACT_ALL(text, '{_EMAIL_RE}')) AS n_emails,
         LEN(REGEXP_EXTRACT_ALL(text, '{_PHONE_RE}')) AS n_phones
  FROM aug
)
SELECT source,
       CAST(SUM(n_emails) AS BIGINT) AS emails_redacted,
       CAST(SUM(n_phones) AS BIGINT) AS phones_redacted,
       CAST(SUM(CASE WHEN n_emails + n_phones > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS docs_with_pii,
       CAST(SUM(raw_len - red_len) AS BIGINT) AS chars_delta
FROM red
GROUP BY source
ORDER BY source
""",
)
def text_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com now"),
            ),
        ).otherwise(""),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" call 555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(""),
    )
    red = d.select(
        "source",
        F.length(aug).alias("raw_len"),
        F.length(
            F.regexp_replace(
                F.regexp_replace(aug, _EMAIL_RE, "<EMAIL>"),
                _PHONE_RE,
                "<PHONE>",
            )
        ).alias("red_len"),
        F.regexp_count(aug, F.lit(_EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(_PHONE_RE)).alias("n_phones"),
    )
    return (
        red.groupBy("source")
        .agg(
            F.sum("n_emails").cast("bigint").alias("emails_redacted"),
            F.sum("n_phones").cast("bigint").alias("phones_redacted"),
            F.sum(((F.col("n_emails") + F.col("n_phones")) > 0).cast("long"))
            .cast("bigint")
            .alias("docs_with_pii"),
            F.sum(F.col("raw_len") - F.col("red_len"))
            .cast("bigint")
            .alias("chars_delta"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Token-length histogram — the corpus-shape report every curation run
# starts with: docs bucketed by token count (width-16 integer buckets; no
# float math anywhere) per language, with each bucket's share of its
# language. One scan + one (lang, bucket) agg; the share window runs over
# the ~dozens-of-rows aggregate, so the whole report shuffles kilobytes
# regardless of corpus size.
# ---------------------------------------------------------------------------
@_q(
    "text_token_histogram",
    oracle=f"""
WITH m AS (
  SELECT lang, (LEN({TOKS_SQL}) // 16) * 16 AS bucket_lo FROM documents
),
g AS (
  SELECT lang, bucket_lo, CAST(COUNT(*) AS BIGINT) AS n_docs FROM m
  GROUP BY lang, bucket_lo
)
SELECT lang, CAST(bucket_lo AS BIGINT) AS bucket_lo, n_docs,
       ROUND(n_docs * 1.0 / SUM(n_docs) OVER (PARTITION BY lang), 6)
         AS lang_share
FROM g
ORDER BY lang, bucket_lo
""",
)
def text_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents").select(
        "lang",
        ((F.size(toks()).cast("bigint") / 16).cast("bigint") * 16).alias(
            "bucket_lo"
        ),
    )
    g = d.groupBy("lang", "bucket_lo").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return (
        g.select(
            "lang",
            "bucket_lo",
            "n_docs",
            F.round(F.col("n_docs") * 1.0 / F.sum("n_docs").over(w), 6).alias(
                "lang_share"
            ),
        )
        .orderBy("lang", "bucket_lo")
    )


# --------------------------------------------------------------------------
# Fixed-size chunking with overlap — the long-document splitting mode of a
# training pipeline (sequence_packing covers the concat-and-chunk mode):
# each doc yields char windows of _CHUNK_LEN with stride _CHUNK_STRIDE, so
# consecutive chunks overlap by LEN-STRIDE chars and every char lands in
# at least one chunk. Pure per-document map work (sequence -> transform ->
# explode), no shuffle at all until the final bounded ORDER BY — at 100 TB
# this is a scan-shaped pass whose output is input_bytes x LEN/STRIDE.
# Chunk identity is md5 so the oracle verifies contents, not just counts.
# --------------------------------------------------------------------------
_CHUNK_LEN = 120
_CHUNK_STRIDE = 90


@_q(
    "text_chunk_stride",
    oracle=f"""
WITH chunks AS (
  SELECT doc_id,
         i AS chunk_idx,
         substr(text, i * {_CHUNK_STRIDE} + 1, {_CHUNK_LEN}) AS chunk
  FROM documents,
       UNNEST(generate_series(0,
         CAST(CEIL(GREATEST(len(text) - {_CHUNK_LEN}, 0)
                   / {_CHUNK_STRIDE}.0) AS BIGINT))) AS g(i)
)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS BIGINT) AS chunk_len,
       md5(chunk) AS chunk_md5
FROM chunks
WHERE doc_id < 120
ORDER BY doc_id, chunk_idx
""",
)
def text_chunk_stride(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").where(F.col("doc_id") < 120)
    n = F.length("text")
    # Number of windows: 1 + ceil(max(n - LEN, 0) / STRIDE) — the last
    # window starts at the smallest i*STRIDE with i*STRIDE + LEN >= n.
    last_idx = F.ceil(
        F.greatest(n - F.lit(_CHUNK_LEN), F.lit(0)) / F.lit(float(_CHUNK_STRIDE))
    ).cast("bigint")
    chunks = docs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), last_idx),
                # Column.substr takes Column offsets, so the window start can
                # depend on the lambda variable without leaving the HOF.
                lambda i: F.struct(
                    i.alias("chunk_idx"),
                    F.col("text")
                    .substr(
                        (i * _CHUNK_STRIDE + 1).cast("int"),
                        F.lit(_CHUNK_LEN),
                    )
                    .alias("chunk"),
                ),
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.length("c.chunk").cast("bigint").alias("chunk_len"),
        F.md5("c.chunk").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_idx")


# --------------------------------------------------------------------------
# Duplicate-block fraction — the RefinedWeb/Dolma per-document dedup
# signal: cut each doc into NON-overlapping _BLK-word blocks, find blocks
# shared verbatim by >= 2 distinct docs, and report what fraction of each
# doc is made of such shared blocks (then roll up per source — the output
# stays dimension-sized at any corpus scale). Distinct from
# text_common_passages (which *lists* cross-doc passages): this scores
# docs for a filter gate. Plan: per-doc map explode -> one shuffle keyed
# on the block string (bounded by block-vocabulary, heavy blocks are
# exactly the interesting ones) -> join back on block -> per-doc, then
# per-source aggregates. No self-join, no all-pairs.
# --------------------------------------------------------------------------
_BLK = 3


@_q(
    "text_dup_block_fraction",
    oracle=f"""
WITH tk AS (
  SELECT doc_id, source, {TOKS_SQL} AS w FROM documents
),
blocks AS (
  SELECT doc_id, source, b.blk
  FROM (
    SELECT doc_id, source,
           [array_to_string(w[i * {_BLK} + 1 : i * {_BLK} + {_BLK}], ' ')
            for i in generate_series(0,
              CAST(CEIL(len(w) / {_BLK}.0) AS BIGINT) - 1)] AS blks
    FROM tk
  ), UNNEST(blks) AS b(blk)
),
shared AS (
  SELECT blk FROM blocks GROUP BY blk HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
  SELECT b.doc_id, b.source,
         COUNT(*) AS n_blocks,
         SUM(CASE WHEN s.blk IS NOT NULL THEN 1 ELSE 0 END) AS n_dup
  FROM blocks b LEFT JOIN shared s ON b.blk = s.blk
  GROUP BY b.doc_id, b.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_blocks) AS BIGINT) AS total_blocks,
       CAST(SUM(n_dup) AS BIGINT) AS dup_blocks,
       ROUND(CAST(SUM(n_dup) AS DOUBLE) / SUM(n_blocks), 6) AS dup_frac,
       CAST(SUM(CASE WHEN n_dup * 2 >= n_blocks THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flagged
FROM per_doc
GROUP BY source
ORDER BY source
""",
)
def text_dup_block_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents").select("doc_id", "source", toks().alias("w"))
    n = F.size("w")
    n_blocks = F.ceil(n / F.lit(float(_BLK))).cast("bigint")
    blocks = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.transform(
                F.sequence(F.lit(0).cast("bigint"), n_blocks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("w"), (i * _BLK + 1).cast("int"), _BLK)
                ),
            )
        ).alias("blk"),
    )
    shared = (
        blocks.groupBy("blk")
        .agg(F.countDistinct("doc_id").alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("blk")
    )
    per_doc = (
        blocks.join(shared.withColumn("is_dup", F.lit(1)), "blk", "left")
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup"),
        )
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_blocks").cast("bigint").alias("total_blocks"),
            F.sum("n_dup").cast("bigint").alias("dup_blocks"),
            F.round(
                F.sum("n_dup").cast("double") / F.sum("n_blocks"), 6
            ).alias("dup_frac"),
            F.sum(
                (F.col("n_dup") * 2 >= F.col("n_blocks")).cast("bigint")
            )
            .cast("bigint")
            .alias("n_flagged"),
        )
        .orderBy("source")
    )


# --------------------------------------------------------------------------
# Distributed heavy hitters — Misra-Gries summaries per partition, merged
# candidates, exact recount. The two-phase shape that finds frequent items
# in one pass over 100 TB without a full word-count shuffle:
#
#   phase 1 (map): each partition keeps a _MG_K-counter Misra-Gries
#     summary (weighted updates from per-Arrow-batch value_counts, so the
#     Python work is vocabulary-sized, not row-sized). Pigeonhole + the
#     MG decrement bound guarantee any word with GLOBAL count >
#     N/(_MG_K+1) exceeds its partition threshold somewhere, so the
#     candidate union is a superset of the true heavy set — for ANY
#     partitioning, which is why the query stays deterministic even
#     though the summaries themselves aren't.
#   phase 2 (verify): exact counts for candidates only (broadcast semi
#     join — the corpus-side explode never shuffles), filtered by the
#     same integer threshold n*(K+1) > N. Superset + exact filter =>
#     output EQUALS the exact heavy-hitter set; the oracle recomputes it
#     from scratch.
#
# The fixture's near-uniform 31-word vocabulary exercises the
# all-fit-in-counters path (every real word survives, the rare 'dup'
# marker is correctly cut); skewed corpora exercise the decrement path,
# covered by the MG unit test in tests/test_textops_sketch.py.
# --------------------------------------------------------------------------
_MG_K = 32


def _mg_summaries(pdf_iter):
    """Per-partition weighted Misra-Gries over a `word` column stream."""
    counters: dict[str, int] = {}
    for pdf in pdf_iter:
        for word, cnt in pdf["word"].value_counts().items():
            counters[word] = counters.get(word, 0) + int(cnt)
            if len(counters) > _MG_K:
                m = min(counters.values())
                counters = {w: c - m for w, c in counters.items() if c > m}
    yield pd.DataFrame({"word": list(counters.keys())})


@_q(
    "text_heavy_hitters_mg",
    oracle=f"""
WITH w AS (
  SELECT unnest({TOKS_SQL}) AS word FROM documents
),
total AS (SELECT COUNT(*) AS n FROM w)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM w, total
GROUP BY word, n
HAVING COUNT(*) * {_MG_K + 1} > n
ORDER BY word
""",
)
def text_heavy_hitters_mg(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = (
        t(spark, sf_dir, "documents")
        .select(F.explode(toks()).alias("word"))
    )
    candidates = (
        words.mapInPandas(_mg_summaries, schema="word string")
        .distinct()
    )
    total = words.agg(F.count("*").alias("n"))
    return (
        words.join(F.broadcast(candidates), "word", "left_semi")
        .groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .join(F.broadcast(total))
        .where(F.col("n_occurrences") * (_MG_K + 1) > F.col("n"))
        .select("word", "n_occurrences")
        .orderBy("word")
    )


# --------------------------------------------------------------------------
# Python UDTF — the table-function leg of the §2.11 surface (pandas_udf /
# applyInPandas / mapInPandas / applyInPandasWithState / spark.udf.register
# cover the rest): a row-to-rows generator registered into the SQL catalog
# with spark.udtf.register and invoked via LATERAL, the idiomatic home for
# "one document in, N typed rows out" logic that doesn't fit a scalar
# UDF. Kept OFF the hot path by design (UDTFs are row-at-a-time Python —
# the builtin-explode chunker text_chunk_stride is the 100 TB path; this
# query pins the SURFACE on a bounded doc_id < 60 slice, pushed into the
# scan). Non-overlapping fixed windows, so the oracle is plain substring
# arithmetic.
# --------------------------------------------------------------------------
_UDTF_CHUNK = 100


@_q(
    "text_udtf_lateral_chunks",
    oracle=f"""
WITH chunks AS (
  SELECT doc_id,
         i AS chunk_idx,
         substr(text, i * {_UDTF_CHUNK} + 1, {_UDTF_CHUNK}) AS chunk
  FROM documents,
       UNNEST(generate_series(0,
         CAST(CEIL(len(text) / {_UDTF_CHUNK}.0) AS BIGINT) - 1)) AS g(i)
  WHERE doc_id < 60
)
SELECT doc_id, chunk_idx,
       CAST(len(chunk) AS BIGINT) AS chunk_len,
       md5(chunk) AS chunk_md5
FROM chunks
ORDER BY doc_id, chunk_idx
""",
)
def text_udtf_lateral_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_idx int, chunk string")
    class ChunkDoc:
        def eval(self, text: str, size: int):
            if not text:
                return
            for i in range(0, len(text), size):
                yield i // size, text[i : i + size]

    spark.udtf.register("chunk_doc", ChunkDoc)
    t(spark, sf_dir, "documents").createOrReplaceTempView("documents_v")
    return spark.sql(
        f"""
        SELECT d.doc_id, c.chunk_idx,
               CAST(length(c.chunk) AS BIGINT) AS chunk_len,
               md5(c.chunk) AS chunk_md5
        FROM documents_v d, LATERAL chunk_doc(d.text, {_UDTF_CHUNK}) c
        WHERE d.doc_id < 60
        ORDER BY d.doc_id, c.chunk_idx
        """
    )


# ---------------------------------------------------------------------------
# PMI collocation mining — the phrase-discovery primitive (word2vec-style
# phrase merging, collocation dictionaries): pointwise mutual information
# ln(c_xy * N / (c_x * c_y)) over word bigrams, thresholded at
# c_xy >= 5 so rare-pair noise can't top the list. One corpus pass builds
# bigram counts; unigram counts broadcast into the scoring join twice
# (w1/w2), so the skewed word keys never shuffle the bigram table.
# Determinism: each PMI is ONE libm ln on an exact integer ratio, rounded
# to 6 before the order-by (with the bigram itself as tiebreak) — same
# discipline as text_unigram_logprob.
# ---------------------------------------------------------------------------
@_q(
    "text_pmi_bigrams",
    oracle=f"""
WITH tk AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
bg AS (
  SELECT UNNEST(LIST_TRANSFORM(generate_series(1, LEN(t) - 1),
                               i -> [t[i], t[i+1]])) AS pair
  FROM tk WHERE LEN(t) >= 2
),
bc AS (
  SELECT pair[1] AS w1, pair[2] AS w2, CAST(COUNT(*) AS BIGINT) AS c_xy
  FROM bg GROUP BY 1, 2
),
uc AS (
  SELECT UNNEST(t) AS w FROM tk
),
u AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM uc GROUP BY w),
n AS (SELECT CAST(SUM(c_xy) AS BIGINT) AS total FROM bc)
SELECT b.w1, b.w2, b.c_xy,
       ROUND(LN(CAST(b.c_xy AS DOUBLE) * n.total
                / (CAST(u1.c AS DOUBLE) * u2.c)), 6) AS pmi
FROM bc b
JOIN u u1 ON b.w1 = u1.w
JOIN u u2 ON b.w2 = u2.w
CROSS JOIN n
WHERE b.c_xy >= 5
ORDER BY pmi DESC, b.w1, b.w2
LIMIT 15
""",
)
def text_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = toks()
    pairs = (
        d.where(F.size(tk) >= 2)
        .select(F.explode(bigrams(tk)).alias("bigram"))
        .select(
            F.split("bigram", " ").getItem(0).alias("w1"),
            F.split("bigram", " ").getItem(1).alias("w2"),
        )
    )
    bc = pairs.groupBy("w1", "w2").agg(F.count("*").cast("bigint").alias("c_xy"))
    u = (
        d.select(F.explode(tk).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    n = bc.agg(F.sum("c_xy").cast("bigint").alias("total"))
    u1 = u.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = u.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    return (
        bc.where(F.col("c_xy") >= 5)
        .join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            "c_xy",
            F.round(
                F.log(
                    F.col("c_xy").cast("double")
                    * F.col("total")
                    / (F.col("c1").cast("double") * F.col("c2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(15)
    )


# --------------------------------------------------------------------------
# Zipf-slope corpus diagnostic — the one-number sanity check corpus
# curators run per source: least-squares slope of ln(freq) ~ ln(rank)
# over the top-_ZIPF_K words (natural text ≈ −1; templated/boilerplate
# sources flatten toward 0). Each ln term is rounded into DECIMAL(18,6)
# BEFORE the regression sums (the engine's established order-free-log
# trick, cf. text_unigram_logprob), so the slope hash-matches across
# engines. One word-count shuffle, one dimension-sized rank + regression.
# --------------------------------------------------------------------------
_ZIPF_K = 100


@_q(
    "text_zipf_slope",
    oracle=f"""
WITH w AS (
  SELECT UNNEST({TOKS_SQL}) AS word, source FROM documents
), c AS (
  SELECT source, word, CAST(COUNT(*) AS BIGINT) AS freq
  FROM w GROUP BY 1, 2
), r AS (
  SELECT source, freq,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY freq DESC, word) AS rnk
  FROM c
), pts AS (
  SELECT source,
         CAST(ROUND(LN(rnk), 6) AS DECIMAL(18,6)) AS x,
         CAST(ROUND(LN(freq), 6) AS DECIMAL(18,6)) AS y
  FROM r WHERE rnk <= {_ZIPF_K}
), s AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM pts GROUP BY source
)
SELECT source, n AS n_ranks,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope
FROM s
ORDER BY source
""",
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = t(spark, sf_dir, "documents")
    c = (
        d.select("source", F.explode(toks()).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").cast("bigint").alias("freq"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("freq"), "word")
    pts = (
        c.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= _ZIPF_K)
        .select(
            "source",
            F.round(F.log("rnk"), 6).cast("decimal(18,6)").alias("x"),
            F.round(F.log("freq"), 6).cast("decimal(18,6)").alias("y"),
        )
    )
    s = pts.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return s.select(
        "source",
        F.col("n").alias("n_ranks"),
        F.round(slope, 6).alias("zipf_slope"),
    ).orderBy("source")


# --------------------------------------------------------------------------
# Source-concentration audit (Gini coefficient + top-share) — the "is my
# corpus dominated by a few crawls?" diagnostic run before fixing a
# training mixture: Gini over per-source char mass via the rank formula
# G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n on the sorted sizes. Everything stays
# exact integer math (ranks × bigint sizes) until the one final division,
# rounded to 6 — so the coefficient hash-matches cross-engine. The rank
# window runs over the source-cardinality aggregate, never the corpus.
# --------------------------------------------------------------------------
@_q(
    "text_source_gini",
    oracle="""
WITH x AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS sz
  FROM documents GROUP BY source
), r AS (
  SELECT sz,
         ROW_NUMBER() OVER (ORDER BY sz, source) AS i,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(sz) OVER () AS BIGINT) AS total
  FROM x
)
SELECT CAST(MIN(n) AS BIGINT) AS n_sources,
       CAST(MIN(total) AS BIGINT) AS total_chars,
       ROUND(2.0 * SUM(i * sz) / (MIN(n) * CAST(MIN(total) AS DOUBLE))
             - (MIN(n) + 1.0) / MIN(n), 6) AS gini,
       ROUND(CAST(MAX(CASE WHEN i > n - 5 THEN run5 END) AS DOUBLE)
             / MIN(total), 6) AS top5_share
FROM (
  SELECT *, SUM(CASE WHEN i > n - 5 THEN sz ELSE 0 END) OVER () AS run5
  FROM r
)
GROUP BY ()
""",
)
def text_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    x = (
        t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("bigint").alias("sz"))
    )
    wr = Window.orderBy("sz", "source")
    wall = Window.partitionBy()
    r = x.select(
        "sz",
        F.row_number().over(wr).cast("bigint").alias("i"),
        F.count("*").over(wall).cast("bigint").alias("n"),
        F.sum("sz").over(wall).cast("bigint").alias("total"),
    )
    r = r.withColumn(
        "run5",
        F.sum(F.when(F.col("i") > F.col("n") - 5, F.col("sz")).otherwise(0))
        .over(wall),
    )
    return r.agg(
        F.min("n").cast("bigint").alias("n_sources"),
        F.min("total").cast("bigint").alias("total_chars"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("sz"))
            / (F.min("n") * F.min("total").cast("double"))
            - (F.min("n") + F.lit(1.0)) / F.min("n"),
            6,
        ).alias("gini"),
        F.round(
            F.max(
                F.when(F.col("i") > F.col("n") - 5, F.col("run5"))
            ).cast("double")
            / F.min("total"),
            6,
        ).alias("top5_share"),
    )


# --------------------------------------------------------------------------
# Classifier quality report — per-language precision / recall / F1 of the
# n-gram language-ID heuristic against the fixture's true labels: the
# eval table every model-in-the-loop pipeline publishes next to its
# confusion matrix (text_language_id IS that matrix; this derives the
# metrics). tp/fp/fn are exact integers; precision and recall are single
# divisions rounded to 6, and F1 is computed FROM the rounded pair —
# identical inputs, identical ops, so the report hash-matches. Work is
# two aggregations over the 25-cell confusion matrix.
# --------------------------------------------------------------------------
@_q(
    "text_lang_id_quality",
    oracle="""
WITH conf AS (SELECT * FROM ({conf})),
byactual AS (
  SELECT actual_lang AS lang,
         CAST(SUM(CASE WHEN actual_lang = predicted_lang THEN n_docs
                       ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(n_docs) AS BIGINT) AS actual_total
  FROM conf GROUP BY 1
),
bypred AS (
  SELECT predicted_lang AS lang, CAST(SUM(n_docs) AS BIGINT) AS pred_total
  FROM conf GROUP BY 1
),
pr AS (
  SELECT a.lang, a.tp, a.actual_total,
         COALESCE(p.pred_total, 0) AS pred_total,
         ROUND(a.tp * 1.0 / NULLIF(p.pred_total, 0), 6) AS precision_,
         ROUND(a.tp * 1.0 / a.actual_total, 6) AS recall_
  FROM byactual a LEFT JOIN bypred p ON p.lang = a.lang
)
SELECT lang, tp, actual_total, pred_total,
       precision_ AS precision, recall_ AS recall,
       ROUND(2 * precision_ * recall_ / NULLIF(precision_ + recall_, 0), 6)
         AS f1
FROM pr
ORDER BY lang
""".format(conf=REGISTRY.oracles["text_language_id"]),
)
def text_lang_id_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    conf = REGISTRY.queries["text_language_id"](spark, sf_dir)
    byactual = conf.groupBy(F.col("actual_lang").alias("lang")).agg(
        F.sum(
            F.when(
                F.col("actual_lang") == F.col("predicted_lang"),
                F.col("n_docs"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("tp"),
        F.sum("n_docs").cast("bigint").alias("actual_total"),
    )
    bypred = conf.groupBy(F.col("predicted_lang").alias("lang")).agg(
        F.sum("n_docs").cast("bigint").alias("pred_total")
    )
    pr = (
        byactual.join(bypred, "lang", "left")
        .withColumn("pred_total", F.coalesce("pred_total", F.lit(0)))
        .withColumn(
            "precision",
            F.round(
                F.col("tp") * 1.0 / F.nullif(F.col("pred_total"), F.lit(0)), 6
            ),
        )
        .withColumn(
            "recall", F.round(F.col("tp") * 1.0 / F.col("actual_total"), 6)
        )
    )
    return pr.select(
        "lang",
        "tp",
        "actual_total",
        "pred_total",
        "precision",
        "recall",
        F.round(
            2 * F.col("precision") * F.col("recall")
            / F.nullif(F.col("precision") + F.col("recall"), F.lit(0)),
            6,
        ).alias("f1"),
    ).orderBy("lang")


# --------------------------------------------------------------------------
# ARROW-OPTIMIZED scalar Python UDF (`@udf(useArrow=True)`, Spark 4) —
# the remaining scalar-UDF leg: same per-row Python semantics as a
# classic UDF but Arrow-batched transfer instead of pickled rows (the
# upgrade path for legacy UDF code that can't be rewritten as pandas
# vectorized). Plan shows ArrowEvalPython, pinned in tests/test_plans.py.
# The kernel counts vowels per document (pure-Python string loop on a
# deterministic ASCII fixture); the oracle recomputes via TRANSLATE
# length arithmetic, so the values — not just the API seam — are
# verified.
# --------------------------------------------------------------------------
@_q(
    "text_arrow_udf_vowels",
    oracle="""
SELECT source,
       CAST(SUM(len(text) - len(translate(text, 'aeiou', ''))) AS BIGINT)
         AS n_vowels,
       CAST(COUNT(*) AS BIGINT) AS n_docs
FROM documents
GROUP BY source
ORDER BY source
""",
)
def text_arrow_udf_vowels(spark: SparkSession, sf_dir: str) -> DataFrame:
    @F.udf(returnType="long", useArrow=True)
    def vowel_count(s: str) -> int:
        if s is None:
            return 0
        return sum(1 for ch in s if ch in "aeiou")

    d = t(spark, sf_dir, "documents")
    return (
        d.select("source", vowel_count("text").alias("nv"))
        .groupBy("source")
        .agg(
            F.sum("nv").cast("bigint").alias("n_vowels"),
            F.count("*").cast("bigint").alias("n_docs"),
        )
        .orderBy("source")
    )
