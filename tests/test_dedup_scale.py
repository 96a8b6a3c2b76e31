"""Adversarial-skew guards for the dedup candidate joins: a flood of
identical documents (the common real-corpus case — boilerplate, templated
spam) must NOT produce a quadratic band bucket. Buckets above _MAX_BUCKET
are dropped before the self-join, in Spark and in every DuckDB oracle
alike; exact-duplicate floods are the linear ``dedup_exact`` pass's job.
"""

import time

from pyspark.sql import functions as F

from aws_glue_data_lake_spark.queries.dedup import (
    _MAX_BUCKET,
    _minhash_candidate_pairs,
    shingles,
    sketch_minhash,
)

FLOOD = "buy cheap pills online now best prices guaranteed click here today"
NEAR_A = "the quick brown fox jumps over the lazy dog near the river bank"
NEAR_B = "the quick brown fox jumps over the lazy dog near the river shore"


def _sketch(spark, rows):
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sh = docs.select("doc_id", shingles().alias("s")).where(F.size("s") > 0)
    return sketch_minhash(sh)


def test_small_identical_group_below_cap_pairs_fully(spark):
    sk = _sketch(spark, [(i, FLOOD) for i in range(10)])
    pairs = _minhash_candidate_pairs(sk).collect()
    assert len(pairs) == 10 * 9 // 2
    assert all(r["n_shared_bands"] == 8 for r in pairs)


def test_embedding_global_pairs_superset_of_per_label(spark):
    """The label-free banding variant must recover every per-label
    candidate pair AND find cross-label pairs the blocked scheme
    structurally misses (on the fixture no merged bucket trips the cap,
    so recall can only grow)."""
    from aws_glue_data_lake_spark.queries.dedup import _embedding_cosine_pairs

    sf_dir = "/root/testdata/sf0.01"
    per_label = {
        (r["vec_a"], r["vec_b"])
        for r in _embedding_cosine_pairs(spark, sf_dir, True).collect()
    }
    global_ = {
        (r["vec_a"], r["vec_b"])
        for r in _embedding_cosine_pairs(spark, sf_dir, False).collect()
    }
    assert per_label <= global_, sorted(per_label - global_)[:10]
    assert len(global_) > len(per_label), (
        "fixture should contain cross-label near-dups; if this starts "
        "failing the fixture generator changed"
    )


def test_flood_above_cap_is_dropped_not_quadratic(spark):
    n = 10_000
    assert n > _MAX_BUCKET
    rows = (
        [(i, FLOOD) for i in range(n)]
        + [(n + 1, NEAR_A), (n + 2, NEAR_B)]
    )
    start = time.time()
    pairs = _minhash_candidate_pairs(_sketch(spark, rows)).collect()
    elapsed = time.time() - start
    # Without the cap this is ~8 * 10k² = 800M joined rows; with it the
    # flood bucket never reaches the join.
    assert elapsed < 120, f"flood handling took {elapsed:.0f}s"
    keys = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (n + 1, n + 2) in keys, "genuine near-dups must still be found"
    assert not any(a < n and b < n for a, b in keys), (
        "flood pairs must be excluded by the bucket cap"
    )


def test_bloom_prefilter_invariants(spark):
    """Bloom screens never lose a duplicate (no false negatives): every
    exact-confirmed doc must also be a bloom candidate, batch counts add
    up, and false positives are exactly candidates minus confirmed."""
    from aws_glue_data_lake_spark.queries import all_queries

    rows = (
        all_queries()["dedup_bloom_gram_prefilter"](spark, "/root/testdata/sf0.001")
        .collect()
    )
    assert rows, "batch split produced no sources"
    for r in rows:
        assert r.n_confirmed <= r.n_candidates
        assert r.n_false_pos == r.n_candidates - r.n_confirmed
        assert r.n_new == r.n_batch - r.n_confirmed
        assert 0 <= r.n_confirmed <= r.n_batch


def test_components_local_unionfind_matches_bsp(spark, monkeypatch):
    """dedup_components solves small edge graphs with a driver-local
    union-find and large ones with the BSP min-label loop; both must
    produce identical component rows (min-id labels, sorted members)."""
    import aws_glue_data_lake_spark.queries.dedup as dd

    sf = "/root/testdata/sf0.01"
    local = dd.dedup_components(spark, sf).collect()
    monkeypatch.setattr(dd, "_LOCAL_CC_MAX_EDGES", -1)  # force BSP
    bsp = dd.dedup_components(spark, sf).collect()
    assert local == bsp
    assert len(local) > 0


def test_cosine_topk_two_phase_matches_full_rescore(spark):
    """The two-phase top-20 (double-precision threshold + exact rescore
    of survivors) must reproduce the exact-cosine-on-every-pair ranking
    bit for bit, for both banding variants."""
    import aws_glue_data_lake_spark.queries.dedup as dd
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    for with_label in (True, False):
        full = (
            dd._embedding_cosine_pairs(spark, sf, with_label)
            .orderBy(F.desc("cosine"), "vec_a", "vec_b")
            .limit(20)
            .collect()
        )
        two_phase = dd._embedding_cosine_topk(spark, sf, with_label).collect()
        assert two_phase == full
        assert len(full) > 0


def test_semdedup_prefilter_is_conservative(spark):
    """No pair that passes the exact ε-test may be rejected by the
    double-precision prefilter margin (the prefilter can only shrink the
    exact test's INPUT, never its output)."""
    import aws_glue_data_lake_spark.queries.similarity as sim
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    nv = sim._nv(spark, sf)
    _, assigned = sim._km_assigned(spark, sf)
    a = assigned.select(
        "centroid_id", F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"), F.col("norm").alias("na"),
    )
    b = assigned.select(
        "centroid_id", F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"), F.col("norm").alias("nb"),
    )
    fast = F.aggregate(
        F.zip_with(F.col("ea"), F.col("eb"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    ) / (F.col("na") * F.col("nb"))
    exact_pass = sim._cosine(
        F.col("ea"), F.col("na"), F.col("eb"), F.col("nb")
    ) >= sim._SEM_EPS
    violations = (
        a.join(b, "centroid_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(exact_pass)
        .where(fast < F.lit(sim._SEM_EPS - 5e-7 - 1e-7))
        .count()
    )
    assert violations == 0


def test_local_cc_labels_slab_scale_matches_reference(spark):
    """The Arrow/numpy union-find at a slab near the gate boundary:
    bounded driver structures (two int64 arrays + one parent array, no
    Row objects / 4M-entry dict) and labels identical to a reference
    dict union-find. 400k edges over ~200k nodes with long chains and
    random cross-links exercises deep paths and rank-free rooting."""
    import random

    import aws_glue_data_lake_spark.queries.dedup as dd
    from pyspark.sql import functions as F

    n_edges = 400_000
    rng = random.Random(7)
    # chains of length 50 over ids spread out (non-dense node space),
    # plus random cross-links merging chains
    edges = []
    for c in range(n_edges // 2 // 50):
        base = c * 1_000 + 5
        for i in range(50):
            a, b = base + i * 7, base + (i + 1) * 7
            edges.append((min(a, b), max(a, b)))
    while len(edges) < n_edges:
        a = rng.randrange(0, 8_000_000)
        b = rng.randrange(0, 8_000_000)
        if a != b:
            edges.append((min(a, b), max(a, b)))
    pairs = spark.createDataFrame(
        edges, "doc_a bigint, doc_b bigint"
    ).persist()
    got = {
        (r["node"], r["label"])
        for r in dd._local_cc_labels(spark, pairs).collect()
    }
    pairs.unpersist()

    # reference: classic dict union-find rooted at smaller id
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    want = {(n, find(n)) for n in parent}
    assert got == want
