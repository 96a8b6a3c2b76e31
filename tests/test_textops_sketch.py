"""Unit tests for the Misra-Gries summary kernel (text_heavy_hitters_mg):
the fixture corpus is near-uniform, so the decrement path — the part that
makes MG a sketch instead of a dict — is exercised here with skewed data."""

from collections import Counter

import pandas as pd

from aws_glue_data_lake_spark.queries.textops import _MG_K, _mg_summaries


def _mg_candidates(words, batch=997):
    batches = (
        pd.DataFrame({"word": words[i : i + batch]})
        for i in range(0, len(words), batch)
    )
    (out,) = list(_mg_summaries(batches))
    return set(out["word"])


def test_mg_decrement_path_keeps_heavy_superset():
    # Zipf-ish: word_i appears (5000 // (i+1)) times over 400 distinct
    # words — far more than _MG_K counters, so decrements must fire.
    words = []
    for i in range(400):
        words.extend([f"w{i}"] * (5000 // (i + 1)))
    exact = Counter(words)
    n = len(words)
    heavy = {w for w, c in exact.items() if c * (_MG_K + 1) > n}
    assert heavy, "test data must contain true heavy hitters"
    cands = _mg_candidates(words)
    # The MG guarantee: candidates are a superset of the heavy set...
    assert heavy <= cands
    # ...and a real summary, not a full dict.
    assert len(cands) <= _MG_K


def test_mg_superset_holds_under_any_partitioning():
    words = []
    for i in range(400):
        words.extend([f"w{i}"] * (5000 // (i + 1)))
    exact = Counter(words)
    n = len(words)
    heavy = {w for w, c in exact.items() if c * (_MG_K + 1) > n}
    # Split into 4 "partitions" (each its own summary, as mapInPandas
    # would), sorted vs interleaved — the union must still cover heavy.
    for order in (sorted(words), words):
        parts = [order[j::4] for j in range(4)]
        union = set()
        for p in parts:
            union |= _mg_candidates(p)
        assert heavy <= union


def test_ngrams_matches_naive_sliding_window(spark):
    """The zip_with self-shift n-gram chain (textops.ngrams) must equal the
    naive sliding window for every width and for token lists shorter than,
    equal to, and longer than the width."""
    from pyspark.sql import functions as F

    from aws_glue_data_lake_spark.queries.textops import ngrams, toks

    rows = [
        ("",),
        ("one",),
        ("a b",),
        ("a b c d e f g h",),  # len == 8
        ("the quick brown fox jumps over the lazy dog again and again",),
        ("  double   spaced   tokens  ",),
    ]
    df = spark.createDataFrame(rows, "text string")
    for width in (2, 3, 5, 8):
        got = [
            r[0]
            for r in df.select(ngrams(toks(), width).alias("g")).collect()
        ]
        for (text,), grams in zip(rows, got):
            tk = [w for w in text.split(" ") if w]
            want = [
                " ".join(tk[i : i + width])
                for i in range(len(tk) - width + 1)
            ]
            assert grams == want, (text, width, grams, want)
