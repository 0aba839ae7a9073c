"""Correctness tests for the training-data operator families (text,
dedup, similarity, multimodal) with planted duplicates and known
vectors — covers the non-SQL-expressible paths (xxhash64 MinHash-LSH,
SimHash, IVF) that the driver only rows-checks."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

# matches HashAggregate/SortAggregate/ObjectHashAggregate keyed on
# doc_a — the stable marker of a pair-dedup aggregate in an executed
# plan, robust to Spark picking a different aggregate flavor
_DEDUP_AGG = re.compile(r"aggregate\(keys=\[doc_a", re.IGNORECASE)

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import dedup as D
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import multimodal as M
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import similarity as S
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import text as X

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far into the "
    "green forest while the sun is setting slowly behind the hills"
)
NEAR = BASE.replace("green forest", "dark forest")  # one shingle region changed
OTHER = (
    "completely different content about databases indexes partitions "
    "shuffles joins aggregations windows and catalyst optimizer internals"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, "  " + BASE.upper() + "  "),  # dup of 1 after normalization
        (4, NEAR),  # near-dup of 1
        (5, OTHER),
        (6, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(docs):
    kept = sorted(r.doc_id for r in D.exact_dedup(docs, "doc_id").collect())
    assert kept == [1, 4, 5, 6]


def test_exact_dedup_idempotent(docs):
    once = D.exact_dedup(docs, "doc_id")
    twice = D.exact_dedup(once, "doc_id")
    assert once.count() == twice.count()


def test_exact_dedup_keep_cols_identical_survivors(spark, docs):
    """r16: keep_cols narrows the returned columns only — the survivor
    set and every returned value must match the full-width path plus a
    projection, on BOTH policies (min_by keep-lowest-id and the
    keep-best ranking window), including on a real corpus."""
    full = sorted(
        (r.doc_id,) for r in D.exact_dedup(docs, "doc_id").select("doc_id").collect()
    )
    nar = sorted(
        tuple(r) for r in D.exact_dedup(docs, "doc_id", keep_cols=("doc_id",)).collect()
    )
    assert nar == full
    docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = sorted(
        tuple(r)
        for r in D.exact_dedup(docs01, "doc_id")
        .select("doc_id", "lang", "source")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in D.exact_dedup(
            docs01, "doc_id", keep_cols=("doc_id", "lang", "source")
        ).collect()
    )
    assert a == b
    c = sorted(
        tuple(r)
        for r in D.exact_dedup(docs01, "doc_id", score_col="n_chars")
        .select("doc_id", "lang", "n_chars")
        .collect()
    )
    d = sorted(
        tuple(r)
        for r in D.exact_dedup(
            docs01, "doc_id", score_col="n_chars",
            keep_cols=("doc_id", "lang", "n_chars"),
        ).collect()
    )
    assert c == d


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5).collect()
    got = {(r.doc_a, r.doc_b) for r in pairs}
    # exact dups have jaccard 1.0; the near-dup pair crosses 0.5
    assert (1, 2) in got and (1, 3) in got and (2, 3) in got
    assert (1, 4) in got
    assert not any(5 in p or 6 in p for p in got)
    j = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert j[(1, 2)] == 1.0
    assert 0.5 <= j[(1, 4)] < 1.0


def test_stop_shingle_cap_bounds_pairs(spark):
    # a shingle shared by every doc generates no pairs once capped
    rows = [(i, f"common shingle here unique{i} tail{i} words{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.ngram_jaccard_pairs(
        df, "doc_id", threshold=0.01, max_shingle_freq=3
    ).collect()
    assert pairs == []


def test_candidate_pair_guard_refuses_dense_corpus(docs):
    """VERDICT r8 ask #5: a default-invoked call whose estimated
    candidate-pair count (Σ f·(f−1)/2 over shingle frequencies) exceeds
    max_candidate_pairs must refuse up front — before the quadratic
    self-join runs — and name every escape hatch."""
    with pytest.raises(ValueError, match="max_candidate_pairs"):
        # the planted corpus has 3 mutually-duplicate docs; a bound of 1
        # is below its pair estimate, so the guard must trip
        D.ngram_jaccard_pairs(docs, "doc_id", max_candidate_pairs=1).collect()
    try:
        D.ngram_jaccard_pairs(docs, "doc_id", max_candidate_pairs=1).collect()
    except ValueError as ex:
        msg = str(ex)
        assert "max_shingle_freq" in msg and "minhash_lsh_dedup" in msg
        assert "max_candidate_pairs=None" in msg


def test_candidate_pair_guard_default_passes_and_is_exact(docs):
    """Under the bound, the default-on guard must not change the exact
    result: identical pairs with and without the guard."""
    guarded = D.ngram_jaccard_pairs(docs, "doc_id", threshold=0.5)
    unguarded = D.ngram_jaccard_pairs(
        docs, "doc_id", threshold=0.5, max_candidate_pairs=None
    )
    a = sorted((r.doc_a, r.doc_b, r.jaccard) for r in guarded.collect())
    b = sorted((r.doc_a, r.doc_b, r.jaccard) for r in unguarded.collect())
    assert a == b and a  # non-vacuous


def test_candidate_pair_guard_estimates_post_cap(spark):
    """The estimate must be computed AFTER the stop-shingle cut: a
    corpus whose only heavy shingles are capped away passes a tight
    bound that its uncapped estimate would trip."""
    rows = [(i, f"common shingle here unique{i} tail{i} words{i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # uncapped estimate: the 'common shingle here' gram alone is 10·9/2 = 45
    with pytest.raises(ValueError):
        D.ngram_jaccard_pairs(df, "doc_id", max_candidate_pairs=10).collect()
    pairs = D.ngram_jaccard_pairs(
        df, "doc_id", max_shingle_freq=3, max_candidate_pairs=10
    ).collect()
    assert pairs == []


def test_zipped_gram_spelling_matches_positional_slices(spark):
    """r10 shingling rewrite: gram windows come from n shifted slices
    zipped (O(n) tokenizations per row) instead of a per-position slice
    inside the interpreted lambda (O(tokens) re-tokenizations per row,
    measured 4-6x slower). The OUTPUT must be bit-identical to the old
    positional spelling — same strings, same xxhash64 values, same
    distinct order — or every persisted shingle-keyed artifact breaks."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        tokens,
    )

    def old_hashes(col, n):
        toks = tokens(col)
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        grams = F.transform(
            idx, lambda i: F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n)))
        )
        return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<bigint>")
        )

    def old_strings(col, n):
        toks = tokens(col)
        idx = F.sequence(F.lit(0), F.size(toks) - n)
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
        )
        return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>")
        )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    edge = spark.createDataFrame(
        [(100001, ""), (100002, "one"), (100003, "one two"),
         (100004, "one two three"), (100005, "  A  b\tC  "),
         (100006, "x " * 40)],
        "doc_id long, text string",
    )
    df = docs.select("doc_id", "text").unionByName(edge)
    for n in (2, 3, 5):
        bad = (
            df.select(
                D.word_ngram_hashes("text", n).alias("a"),
                old_hashes("text", n).alias("b"),
                D.word_ngrams("text", n).alias("c"),
                old_strings("text", n).alias("d"),
            )
            .filter((F.col("a") != F.col("b")) | (F.col("c") != F.col("d")))
            .count()
        )
        assert bad == 0, f"n={n}: zipped spelling diverged"


def test_candidate_pair_guard_skips_estimator_under_cheap_bound(spark):
    """VERDICT r9 ask #5: on a corpus where P·(n−1)/2 (total postings ×
    docs, the provable upper bound on Σ f·(f−1)/2) already clears the
    cap, the default call must run only the O(docs) pre-check job — the
    explode + groupBy-shuffle estimator is skipped. Pinned RELATIVELY:
    construction of the default call submits strictly fewer Spark jobs
    than a construction forced through the full estimator by a tight
    cap (job counts are never pinned to AQE internals)."""

    def _jobs(group, fn):
        sc = spark.sparkContext
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    j_default = _jobs(
        "ngram-guard-default",
        lambda: D.ngram_jaccard_pairs(docs, "doc_id"),  # construct only
    )

    def forced():
        try:
            # a cap under the cheap bound (~6M at sf0.01) forces tier 2;
            # whether the estimator then refuses or passes is irrelevant
            # here — either way its job ran.
            D.ngram_jaccard_pairs(docs, "doc_id", max_candidate_pairs=10)
        except ValueError:
            pass

    j_forced = _jobs("ngram-guard-forced", forced)
    assert j_default < j_forced
    # the pre-check is one tiny agg action; the observed 3-4 jobs are
    # the parquet schema-inference read plus AQE's split of the agg —
    # a small constant, never O(postings)
    assert j_default <= 4


def test_contamination_probe_skipped_under_cheap_bound(spark):
    """VERDICT r10 ask #7: cross_ngram_contamination's broadcastability
    decision gets the same two-tier treatment as the ngram guard —
    distinct eval shingles ≤ total eval postings, so when the map-side
    postings agg (no explode, no distinct shuffle) already clears
    broadcast_eval_shingles, the limit+count probe job is skipped.
    Pinned RELATIVELY: the small-eval default call submits strictly
    fewer jobs during construction than a call whose threshold forces
    the exact probe."""

    def _jobs(group, fn):
        sc = spark.sparkContext
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    train = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ev = spark.createDataFrame(
        [(1, BASE), (2, OTHER)], "doc_id long, text string"
    )
    regs: list[list] = [[], []]
    j_default = _jobs(
        "contam-default",
        lambda: D.cross_ngram_contamination(
            train, ev, cache_registry=regs[0]
        ),
    )
    # threshold 1 puts the postings bound above it AND makes the exact
    # probe run (and fail → shuffle-join path); either way its job ran
    j_forced = _jobs(
        "contam-forced",
        lambda: D.cross_ngram_contamination(
            train, ev, broadcast_eval_shingles=1, cache_registry=regs[1]
        ),
    )
    assert j_default < j_forced
    assert j_default <= 4  # the eval-postings agg, never the probe
    for r in regs:
        D.release_caches(r)


def test_expr_fastpath_parity(spark):
    """r16: string-named columns route the hot token builders through a
    single F.expr string (one py4j round trip instead of one per tree
    node — ~70-100 ms of driver time per word_ngram_hashes build). The
    SQL spelling must produce BIT-IDENTICAL values to the functions-API
    tree it replaces: same token arrays, same gram order, same xxhash64
    shingles — pinned here by evaluating both paths side by side over
    edge-case docs (empty, sub-n, exact-n, tabs/newlines/multi-space,
    uppercase, duplicate grams) plus the sf0.01 corpus."""
    edge = spark.createDataFrame(
        [
            (1, ""),
            (2, "one"),
            (3, "one two"),
            (4, "one two three"),
            (5, "A\tB\nC   D E"),
            (6, "x y z x y z x y z"),
            (7, "  leading and trailing  "),
        ],
        "doc_id long, text string",
    )
    corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for df in (edge, corpus):
        # functions-API spellings (the Column-input path, unchanged)
        c = F.col("text")
        rows = (
            df.select(
                (X.tokens("text") == X.tokens(c)).alias("tok_eq"),
                (
                    X.zipped_token_grams("text", 3).cast("string")
                    == X.zipped_token_grams(c, 3).cast("string")
                ).alias("zip_eq"),
                (D.word_ngrams("text", 3) == D.word_ngrams(c, 3)).alias(
                    "grams_eq"
                ),
                (
                    D.word_ngram_hashes("text", 3) == D.word_ngram_hashes(c, 3)
                ).alias("hash_eq"),
                (D.word_ngram_hashes("text", 8) == D.word_ngram_hashes(c, 8)).alias(
                    "hash8_eq"
                ),
            )
            .collect()
        )
        for r in rows:
            assert r.tok_eq and r.zip_eq and r.grams_eq and r.hash_eq and r.hash8_eq


def test_zipped_token_grams_total_on_short_docs(spark):
    """ADVICE r10: the shifted-slice helper must be TOTAL — a doc with
    fewer than n-1 tokens used to produce a negative slice length
    (Spark's slice throws on negative length), so any caller that
    forgot the when(size>=n) guard got a runtime error. The clamp makes
    short docs yield an empty array; existing guards stay purely
    semantic gates."""
    df = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "one two"), (4, "one two three")],
        "doc_id long, text string",
    )
    # raw helper, deliberately WITHOUT the when(size>=n) guard
    rows = (
        df.select("doc_id", F.size(X.zipped_token_grams("text", 3)).alias("k"))
        .orderBy("doc_id")
        .collect()
    )
    assert [r.k for r in rows] == [0, 0, 0, 1]


def test_tier2_guard_pin_released_via_cache_registry(spark):
    """ADVICE r10: on the tier-2 guard PASS path the shingled frame
    stays persisted (estimator + executed plan share one scan); the
    caller must be able to release it via cache_registry +
    release_caches instead of spark.catalog.clearCache()."""
    # entirely-unique shingles: tier-1 bound P·(n−1)/2 = 60·9/2 = 270
    # trips a cap of 100, but every shingle freq is 1 so the exact
    # estimate is 0 — tier 2 runs and PASSES, pinning the frame.
    rows = [
        (i, f"a{i} b{i} c{i} d{i} e{i} f{i} g{i} h{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    registry = []
    pairs = D.ngram_jaccard_pairs(
        df, "doc_id", max_candidate_pairs=100, cache_registry=registry
    )
    assert len(registry) == 1 and registry[0].is_cached
    assert pairs.collect() == []  # no shared shingles → no pairs
    D.release_caches(registry)
    assert registry == []


def test_minhash_lsh_dedup_removes_planted_dups(docs):
    kept = D.minhash_lsh_dedup(docs, "doc_id", verify_threshold=0.8)
    ids = sorted(r.doc_id for r in kept.collect())
    # 2 and 3 are jaccard-1.0 dups of 1 → removed; 4 is below 0.8 verify
    assert 1 in ids and 2 not in ids and 3 not in ids
    assert 5 in ids and 6 in ids


def test_minhash_signature_shape(docs):
    sigs = D.minhash_signatures(docs, "doc_id", num_hashes=16, portable=False)
    row = sigs.filter(F.col("doc") == 1).first()
    assert len(row.sig) == 16
    # identical text → identical signature
    row2 = sigs.filter(F.col("doc") == 2).first()
    assert list(row.sig) == list(row2.sig)


def test_simhash_dups_collide(docs):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in D.simhash_near_dup_pairs(docs, "doc_id").collect()
    }
    # identical normalized text → identical simhash → collide in every band
    assert (1, 2) in pairs and (1, 3) in pairs
    # near-dup text must land Hamming-closer to its original than
    # unrelated text does (band collision is only guaranteed < `bands`
    # bits apart, which one changed word need not satisfy)
    h = {r.doc: r.h for r in D.simhash_table(docs, "doc_id").collect()}

    def ham(a: int, b: int) -> int:
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(h[1], h[4]) < ham(h[1], h[5])


def test_simhash_table_deterministic(docs):
    h1 = {r.doc: r.h for r in D.simhash_table(docs, "doc_id").collect()}
    h2 = {r.doc: r.h for r in D.simhash_table(docs, "doc_id").collect()}
    assert h1 == h2
    assert h1[1] == h1[2]


@pytest.fixture(scope="module")
def boilerplate_docs(spark):
    """40 boilerplate-identical docs (every band bucket hot, f=40) plus
    one planted near-dup pair of distinct content (cold buckets, f=2)."""
    rows = [(i, "standard legal disclaimer text repeated verbatim") for i in range(40)]
    rows += [(100, BASE), (101, BASE)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_simhash_candidate_guard_refuses_boilerplate_corpus(boilerplate_docs):
    """VERDICT r11 ask #4: a boilerplate-heavy corpus makes the band
    self-join near-quadratic in the hot buckets (here Σ f·(f−1)/2 =
    4·(780+1) = 3124 join rows from 42 docs); the default-on guard must
    refuse before the join runs and name every escape hatch."""
    with pytest.raises(ValueError, match="max_candidate_pairs"):
        D.simhash_near_dup_pairs(
            boilerplate_docs, "doc_id", max_candidate_pairs=100
        ).collect()
    try:
        D.simhash_near_dup_pairs(
            boilerplate_docs, "doc_id", max_candidate_pairs=100
        ).collect()
    except ValueError as ex:
        msg = str(ex)
        assert "max_bucket_size" in msg and "minhash_lsh_dedup" in msg
        assert "max_candidate_pairs=None" in msg


def test_simhash_bucket_cap_bounds_output(boilerplate_docs):
    """max_bucket_size drops the hot (band, bucket) groups before the
    join: the boilerplate mass (40 docs × 4 hot buckets) contributes
    zero pairs, the planted cold pair survives, and the post-cap
    estimate passes a bound the uncapped corpus trips."""
    pairs = D.simhash_near_dup_pairs(
        boilerplate_docs, "doc_id", max_bucket_size=10, max_candidate_pairs=100
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(100, 101)}


def test_simhash_first_collide_randomized_corpus_equals_distinct(spark):
    """Randomized partial-band collisions (the fixture above covers the
    maximal all-bands case): 60 docs drawn from a 12-word vocab with
    heavy repetition produce pairs colliding in 1..4 bands; the
    first-collide filter path and the distinct path must emit the
    identical pair set for every seed."""
    import random

    for seed in (3, 17, 92):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        docs = spark.createDataFrame(
            [(i, " ".join(rng.choices(vocab, k=rng.randint(8, 20)))) for i in range(60)],
            "doc_id long, text string",
        )
        fc = D.simhash_near_dup_pairs(docs, "doc_id", max_candidate_pairs=None)
        di = D.simhash_near_dup_pairs(docs, "doc_id", max_bucket_size=10**9)
        a = sorted((r.doc_a, r.doc_b) for r in fc.collect())
        b = sorted((r.doc_a, r.doc_b) for r in di.collect())
        assert a == b and a, seed


def test_simhash_first_collide_band_equals_distinct_path(boilerplate_docs):
    """The default (no bucket cap) path dedups multi-band collisions
    with a first-colliding-band FILTER instead of a global distinct —
    a pure codegen predicate in the join stage replacing a wide
    shuffle of every join row. The 40 hash-identical boilerplate docs
    collide in ALL 4 bands (the maximal multi-band case), so set
    equality against the distinct-based path (max_bucket_size huge →
    nothing dropped, distinct retained) proves exactly-once emission;
    the executed plans pin that the filter path carries no
    doc_a-keyed dedup aggregate while the distinct path does (the
    aggregate, not its exchange, is the stable marker — AQE may
    coalesce or elide the shuffle at test partition sizes)."""
    fc = D.simhash_near_dup_pairs(boilerplate_docs, "doc_id")
    di = D.simhash_near_dup_pairs(boilerplate_docs, "doc_id", max_bucket_size=10**9)
    a = sorted((r.doc_a, r.doc_b) for r in fc.collect())
    b = sorted((r.doc_a, r.doc_b) for r in di.collect())
    assert a == b
    assert len(a) == 780 + 1  # C(40,2) boilerplate pairs + planted pair
    fc_plan = fc._jdf.queryExecution().executedPlan().toString()
    di_plan = di._jdf.queryExecution().executedPlan().toString()
    # any aggregate flavor keyed on doc_a is the dedup marker — Spark
    # may plan distinct as Hash/Sort/ObjectHashAggregate depending on
    # version/config, so pin the aggregate kind loosely (ADVICE r12)
    assert not _DEDUP_AGG.search(fc_plan)
    assert _DEDUP_AGG.search(di_plan)


def test_simhash_guard_default_passes_and_is_exact(docs):
    """Under the bound, the default-on guard must not change the
    candidate set: identical pairs with and without the guard."""
    guarded = D.simhash_near_dup_pairs(docs, "doc_id")
    unguarded = D.simhash_near_dup_pairs(docs, "doc_id", max_candidate_pairs=None)
    a = sorted((r.doc_a, r.doc_b) for r in guarded.collect())
    b = sorted((r.doc_a, r.doc_b) for r in unguarded.collect())
    assert a == b and a  # non-vacuous


def test_simhash_guard_cache_registry_releases(boilerplate_docs):
    """When tier 2 runs (estimator persisted the banded frame), the
    caller-supplied registry must receive the pinned frame so
    release_caches can drop it after the final action."""
    registry: list = []
    pairs = D.simhash_near_dup_pairs(
        boilerplate_docs,
        "doc_id",
        max_bucket_size=10,
        max_candidate_pairs=100,
        cache_registry=registry,
    )
    assert pairs.count() == 1
    assert len(registry) == 1 and registry[0].is_cached
    pinned = registry[0]
    D.release_caches(registry)
    assert not pinned.is_cached and not registry


def test_minhash_candidate_guard_refuses_boilerplate_corpus(boilerplate_docs):
    """VERDICT r12 ask #2: the MinHash band self-join has the same
    quadratic hot-bucket failure mode as SimHash's (42 docs, 40
    signature-identical → Σ f·(f−1)/2 = 4·(780+1) = 3124 join rows);
    the default-on guard must refuse before the join runs and name
    every escape hatch."""
    with pytest.raises(ValueError, match="max_candidate_pairs"):
        D.minhash_lsh_pairs(
            boilerplate_docs, "doc_id", max_candidate_pairs=100
        ).collect()
    try:
        D.minhash_lsh_pairs(
            boilerplate_docs, "doc_id", max_candidate_pairs=100
        ).collect()
    except ValueError as ex:
        msg = str(ex)
        assert "max_bucket_size" in msg and "exact_dedup" in msg
        assert "max_candidate_pairs=None" in msg
    # the raise must release every frame the call pinned — the caller
    # never gets a handle to act on (registry contract is success-path)
    registry: list = []
    with pytest.raises(ValueError):
        D.minhash_lsh_pairs(
            boilerplate_docs, "doc_id", max_candidate_pairs=100,
            cache_registry=registry,
        ).collect()
    assert registry and all(not f.is_cached for f in registry)


def test_minhash_bucket_cap_bounds_output(boilerplate_docs):
    """max_bucket_size drops the hot (band, bucket) groups before the
    join: the boilerplate mass (40 signature-identical docs × 4 hot
    buckets) contributes zero pairs, the planted cold pair survives,
    and the post-cap estimate passes a bound the uncapped corpus
    trips."""
    pairs = D.minhash_lsh_pairs(
        boilerplate_docs, "doc_id", max_bucket_size=10, max_candidate_pairs=100
    ).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {(100, 101)}


def test_minhash_first_collide_band_equals_distinct_path(boilerplate_docs):
    """The default (no bucket cap) path dedups multi-band collisions
    with a first-colliding-band FILTER over the per-doc band-bucket
    arrays instead of a global distinct — the filter compares the same
    band-bucket hashes the join matched on (xxhash64 longs on the
    default path, 60-bit md5-prefix longs on the portable path), so
    emission is exactly-once by construction. The 40 signature-identical boilerplate docs
    collide in ALL 4 bands (maximal multiplicity); set equality
    against the distinct-based path (max_bucket_size huge → nothing
    dropped, distinct retained) proves it, and the executed plans pin
    that the filter path carries no doc_a-keyed dedup aggregate while
    the distinct path does."""
    fc = D.minhash_lsh_pairs(boilerplate_docs, "doc_id")
    di = D.minhash_lsh_pairs(boilerplate_docs, "doc_id", max_bucket_size=10**9)
    a = sorted((r.doc_a, r.doc_b) for r in fc.collect())
    b = sorted((r.doc_a, r.doc_b) for r in di.collect())
    assert a == b
    assert len(a) == 780 + 1  # C(40,2) boilerplate pairs + planted pair
    fc_plan = fc._jdf.queryExecution().executedPlan().toString()
    di_plan = di._jdf.queryExecution().executedPlan().toString()
    assert not _DEDUP_AGG.search(fc_plan)
    assert _DEDUP_AGG.search(di_plan)


def test_minhash_first_collide_randomized_corpus_equals_distinct(spark):
    """Randomized partial-band collisions: 60 docs drawn from a
    12-word vocab with heavy repetition produce signature agreement in
    1..4 bands, plus one planted identical pair (all-bands case,
    guarantees non-vacuity for every seed); the first-collide filter
    path and the distinct path must emit the identical pair set."""
    import random

    for seed in (3, 17, 92):
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]
        rows = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(8, 20))))
            for i in range(60)
        ]
        rows += [(1000, BASE), (1001, BASE)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        fc = D.minhash_lsh_pairs(docs, "doc_id", max_candidate_pairs=None)
        di = D.minhash_lsh_pairs(docs, "doc_id", max_bucket_size=10**9)
        a = sorted((r.doc_a, r.doc_b) for r in fc.collect())
        b = sorted((r.doc_a, r.doc_b) for r in di.collect())
        assert a == b and (1000, 1001) in a, seed


def test_minhash_guard_default_passes_and_is_exact(docs):
    """Under the bound, the default-on guard must not change the
    candidate set: identical pairs with and without the guard."""
    guarded = D.minhash_lsh_pairs(docs, "doc_id")
    unguarded = D.minhash_lsh_pairs(docs, "doc_id", max_candidate_pairs=None)
    a = sorted((r.doc_a, r.doc_b) for r in guarded.collect())
    b = sorted((r.doc_a, r.doc_b) for r in unguarded.collect())
    assert a == b and a  # non-vacuous


def test_minhash_guard_cache_registry_releases(boilerplate_docs):
    """When tier 2 runs WITHOUT the signature cache (cache=False), the
    estimator pins the banded frame so the executed plan shares one
    signature computation; the caller-supplied registry must receive
    it so release_caches can drop it after the final action."""
    registry: list = []
    pairs = D.minhash_lsh_pairs(
        boilerplate_docs,
        "doc_id",
        cache=False,
        max_bucket_size=10,
        max_candidate_pairs=100,
        cache_registry=registry,
    )
    assert pairs.count() == 1
    assert len(registry) == 1 and registry[0].is_cached
    pinned = registry[0]
    D.release_caches(registry)
    assert not pinned.is_cached and not registry


def test_band_width_entry_guards(docs):
    """ADVICE r12: degenerate band counts must fail fast instead of
    silently planning an all-pairs join (zero-bit SimHash bands / a
    zero-row MinHash band make every bucket collide)."""
    with pytest.raises(ValueError, match="bands"):
        D.simhash_near_dup_pairs(docs, "doc_id", bands=0)
    with pytest.raises(ValueError, match="at least one bit"):
        D.simhash_near_dup_pairs(docs, "doc_id", bands=100)
    with pytest.raises(ValueError, match="bands"):
        D.minhash_lsh_pairs(docs, "doc_id", bands=0)
    with pytest.raises(ValueError, match="zero signature"):
        D.minhash_lsh_pairs(docs, "doc_id", num_hashes=0, bands=4)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),  # close to 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 0
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [1.0, 0.05, 0.0, 0.0]),  # closest to 0
        (5, [-1.0, 0.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_orders_correctly(vectors):
    res = S.cosine_topk(vectors, [1.0, 0.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in res] == [0, 4, 1]
    assert res[0].cosine == pytest.approx(1.0)


def test_cosine_topk_float_prefilter_identical(spark, vectors):
    """r16: the two-phase spelling (float64 GEMM prefilter + exact
    re-rank, the 100 TB path) must return the IDENTICAL rows and exact
    cosine values as the one-phase exact plan — including under a
    margin so small the certified-cut fallback triggers."""
    q = [1.0, 0.0, 0.0, 0.0]
    exact = S.cosine_topk(vectors, q, k=3).collect()
    two = S.cosine_topk(vectors, q, k=3, float_prefilter=True).collect()
    assert [(r.vec_id, r.cosine) for r in two] == [
        (r.vec_id, r.cosine) for r in exact
    ]
    # margin 0: the cut cannot be certified -> falls back to exact plan
    tiny = S.cosine_topk(
        vectors, q, k=3, float_prefilter=True, prefilter_margin=0
    ).collect()
    assert [(r.vec_id, r.cosine) for r in tiny] == [
        (r.vec_id, r.cosine) for r in exact
    ]
    # the sf0.01 corpus end-to-end (real float32 vectors)
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    a = S.cosine_topk(emb, qvec, k=10).collect()
    b = S.cosine_topk(emb, qvec, k=10, float_prefilter=True).collect()
    assert [(r.vec_id, r.cosine) for r in a] == [(r.vec_id, r.cosine) for r in b]


def test_dot_exact_sql_parity(spark):
    """r16: the single-expr SQL spelling of dot_exact/cosine_sim_exact
    must be bit-identical to the Column spelling (same casts, same
    DECIMAL(30,12) accumulator)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        _quote_ident,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pair = emb.select(
        F.col("embedding").alias("a"),
        F.reverse("embedding").alias("b"),
    )
    mism = pair.select(
        (
            F.expr(D.dot_exact_sql("a", "b"))
            == D.dot_exact(F.col("a"), F.col("b"))
        ).alias("dot_eq"),
        (
            F.expr(D.cosine_sim_exact_sql(_quote_ident("a"), _quote_ident("b")))
            == D.cosine_sim_exact(F.col("a"), F.col("b"))
        ).alias("cos_eq"),
    ).filter("NOT (dot_eq AND cos_eq)").count()
    assert mism == 0


def test_cosine_topk_per_query(spark, vectors):
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (200, [0.0, 1.0, 0.0, 0.0])],
        "query_id long, query_vec array<float>",
    )
    res = S.cosine_topk_per_query(vectors, queries, k=2).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append((r.rk, r.vec_id))
    assert sorted(by_q[100]) == [(1, 0), (2, 4)]
    assert by_q[200][0] == (1, 2)


def test_embedding_near_dup_pairs(vectors):
    pairs = D.embedding_near_dup_pairs(vectors, threshold=0.95).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 4) in got
    assert (0, 5) not in got and (0, 2) not in got


def test_ivf_matches_brute_force_when_probing_all(vectors):
    assigned, cents = S.build_ivf_index(vectors, num_centroids=3)
    exact = [r.vec_id for r in S.cosine_topk(vectors, [1.0, 0.0, 0.0, 0.0], k=3).collect()]
    approx = [
        r.vec_id
        for r in S.ivf_topk(assigned, cents, [1.0, 0.0, 0.0, 0.0], k=3, nprobe=3).collect()
    ]
    assert approx == exact


def test_centroid_assignment_is_one_arrow_gemm_pass(vectors):
    """Assignment must plan as ONE Arrow mapInPandas stage (batch GEMM
    against the broadcast centroid matrix) — per-centroid Catalyst
    expressions are O(rows x centroids) interpreted steps with a plan
    tree O(centroids) wide, the quadratic the sf1 decade caught
    (SCALE.md). Multi-probe must stay a single pass too (the explode
    happens inside the same Arrow kernel)."""
    _, cents = S.build_ivf_index(vectors, num_centroids=3)
    for probe in (1, 2):
        out = S.assign_clusters(vectors, cents, probe=probe)
        s = out._jdf.queryExecution().executedPlan().toString()
        assert s.count("MapInPandas") == 1, s
        rows = out.collect()
        assert len(rows) == vectors.count() * probe
        if probe == 2:
            per_vec = {}
            for r in rows:
                per_vec.setdefault(r.vec_id, []).append(r["__cluster"])
            assert all(len(set(cs)) == 2 for cs in per_vec.values())


def test_ivf_prunes_clusters(vectors):
    assigned, cents = S.build_ivf_index(vectors, num_centroids=3)
    probed = S.ivf_topk(assigned, cents, [1.0, 0.0, 0.0, 0.0], k=6, nprobe=1)
    # probing 1 of 3 clusters must scan a strict subset of the corpus
    assert probed.count() < vectors.count()


def test_language_id_on_clear_samples(spark):
    rows = [
        (1, "the cat and the dog in a house"),
        (2, "der hund und die katze ist nicht da"),
        (3, "le chat et la maison est dans les arbres"),
        (4, "el perro y el gato en la casa es por"),
        (5, "xyzzy plugh qwerty"),
        # CJK script gate: unsegmented Chinese has no whitespace tokens
        # for the stopword tier, the ideograph ratio must catch it
        (6, "今天天气很好我们去公园散步吧"),
        # mostly-Latin text with one stray ideograph stays on tier 2
        (7, "the spark engine reads the 表 table files"),
        # empty text: 0*20 >= 0 must NOT satisfy the CJK gate
        (8, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pred = {r.doc_id: r.lang_pred for r in X.language_id_stopword(df).collect()}
    assert pred == {
        1: "en", 2: "de", 3: "fr", 4: "es", 5: "und", 6: "zh", 7: "en", 8: "und",
    }


def test_language_id_dispatcher_stopword_tier(spark):
    """Pin the dispatcher's documented fallback (VERDICT r7 ask #6):
    ``language_id(method="stopword")`` must route to the single-pass
    stopword heuristic and agree with it row-for-row — the stopword
    tier lost its direct driver row when the trigram path became the
    default, so this pin is its contract. Unknown methods must raise,
    not silently fall through to either tier."""
    rows = [
        (1, "the cat and the dog in a house"),
        (2, "der hund und die katze ist nicht da"),
        (3, "今天天气很好我们去公园散步吧"),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    via_dispatch = {
        r.doc_id: r.lang_pred
        for r in X.language_id(df, method="stopword").collect()
    }
    direct = {
        r.doc_id: r.lang_pred for r in X.language_id_stopword(df).collect()
    }
    assert via_dispatch == direct == {1: "en", 2: "de", 3: "zh", 4: "und"}
    with pytest.raises(ValueError, match="unknown language_id method"):
        X.language_id(df, method="fasttext")


def test_quality_features_ranges(docs):
    feats = X.quality_features(docs).collect()
    for r in feats:
        assert 0.0 <= r.quality_score <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.stopword_ratio <= 1.0


def test_bpe_ish_counts_more_than_whitespace(spark):
    df = spark.createDataFrame([(1, "abc123 def, ghi.")], "id long, text string")
    r = df.select(
        X.token_count("text").alias("ws"), X.bpe_ish_token_count("text").alias("bpe")
    ).first()
    assert r.ws == 3
    assert r.bpe > r.ws


def test_media_metadata_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    row = M.attach_media_from_text(df).select("media.*").first()
    assert bytes(row.content) == b"hello world"
    assert row.meta.byte_len == 11
    assert row.meta.mime == "application/octet-stream"


def test_decode_image_stub_shapes(spark):
    df = M.attach_media_from_text(
        spark.createDataFrame([(i, f"payload {i}") for i in range(5)], "doc_id long, text string")
    )
    out = M.decode_image_batch(df, size=(8, 8)).collect()
    assert len(out) == 5
    assert all(r.height == 8 and r.width == 8 and r.channels == 3 for r in out)
    # deterministic: same input → same pixel_sum
    out2 = M.decode_image_batch(df, size=(8, 8)).collect()
    assert {(r.id, r.pixel_sum) for r in out} == {(r.id, r.pixel_sum) for r in out2}


def test_video_frame_sampling(spark):
    df = M.attach_media_from_text(
        spark.createDataFrame([(1, "x" * 200)], "doc_id long, text string")
    )
    frames = M.sample_video_frames(df, every_n=2, max_frames=4).collect()
    # 200 bytes → 13 chunks of 16 → every 2nd → 7 → capped at 4
    assert len(frames) == 4
    assert [f.frame_index for f in frames] == [0, 1, 2, 3]


def test_ivf_partitioned_index_prunes_and_matches(spark, vectors, tmp_path):
    idx = str(tmp_path / "ivf_idx")
    cents = S.write_ivf_index(vectors, idx, num_centroids=3)
    got = S.ivf_topk_from_index(spark, idx, cents, [1.0, 0.0, 0.0, 0.0], k=3, nprobe=3)
    exact = [r.vec_id for r in S.cosine_topk(vectors, [1.0, 0.0, 0.0, 0.0], k=3).collect()]
    assert [r.vec_id for r in got.collect()] == exact
    # partition pruning: the cluster predicate must reach PartitionFilters
    pruned = S.ivf_topk_from_index(spark, idx, cents, [1.0, 0.0, 0.0, 0.0], k=3, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [__cluster" in plan or "__cluster#" in plan


def test_audio_features_stub(spark):
    df = M.attach_media_from_text(
        spark.createDataFrame([(1, "abcd" * 100), (2, "")], "doc_id long, text string")
    )
    rows = {r.id: r for r in M.extract_audio_features(df).collect()}
    assert rows[1].n_samples == 400
    assert rows[1].duration_ms == pytest.approx(25.0)
    assert 0.0 < rows[1].rms < 1.0
    assert rows[2].n_samples == 0 and rows[2].rms == 0.0


def test_bucketed_near_dup_is_equi_join_and_finds_close_pairs(spark, vectors):
    out = D.embedding_near_dup_pairs_bucketed(
        vectors, threshold=0.95, num_buckets=2
    )
    got = {(r.id_a, r.id_b) for r in out.collect()}
    # the genuinely near-identical pair quantizes to the same bucket
    assert (0, 4) in got
    # plan must be an equi-join on the bucket, never a nested-loop pair join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_bucketed_near_dup_recall_on_corpus(spark):
    """The corpus is random vectors (max pair cosine ≈ 0.5 — zero pairs
    exist above 0.9, so a high-threshold check would be vacuous); at the
    0.4 working threshold the bucketed path must stay a strict subset of
    brute force with measured-recall headroom (0.53 on this data)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_dup_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_dup_pairs_bucketed(
            emb, threshold=0.4, num_buckets=4
        ).collect()
    }
    assert exact, "corpus must contain pairs at the working threshold"
    assert approx <= exact  # never invents pairs
    assert len(approx) / len(exact) >= 0.3
    # probe-2 assignment recovers cross-bucket borderline pairs
    probed = {
        (r.id_a, r.id_b)
        for r in D.embedding_near_dup_pairs_bucketed(
            emb, threshold=0.4, num_buckets=4, probe=2
        ).collect()
    }
    assert approx <= probed <= exact
    assert len(probed) / len(exact) >= 0.8


def test_refined_centroids_improve_or_keep_balance(spark):
    """Two Lloyd rounds must keep centroid count, dimensionality, and
    bucket balance, and must not hurt probe recall on the corpus."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    brute = {r.vec_id for r in S.cosine_topk(emb, qvec, k=10).collect()}

    def recall(refine_rounds):
        assigned, cents = S.build_ivf_index(
            emb, num_centroids=16, refine_rounds=refine_rounds
        )
        assert len(cents) == 16 and all(len(v) == 64 for _, v in cents)
        got = {
            r.vec_id
            for r in S.ivf_topk(assigned, cents, qvec, k=10, nprobe=8).collect()
        }
        sizes = [
            r["count"] for r in assigned.groupBy("__cluster").count().collect()
        ]
        assert max(sizes) <= 2.5 * (sum(sizes) / len(sizes))
        return len(got & brute) / 10

    assert recall(2) >= recall(0)


def test_brute_force_near_dup_refuses_oversized_corpus(spark, vectors):
    """The O(n²) baseline must refuse corpora above max_rows so the
    quadratic plan can't reach a production-sized input."""
    import pytest as _pytest

    with _pytest.raises(ValueError, match="bucketed"):
        D.embedding_near_dup_pairs(vectors, threshold=0.9, max_rows=2)
    # escape hatch still works
    assert D.embedding_near_dup_pairs(vectors, threshold=0.9, max_rows=None).count() >= 0


def test_ivf_centroids_content_independent_and_balanced(spark):
    """Centroid sampling must be hash-spread (not the lowest-id prefix,
    which skews when ids correlate with content) and produce buckets
    with max <= 2.5x mean on the corpus."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import similarity as S
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    assigned, cents = S.build_ivf_index(emb, num_centroids=16)
    ids = [cid for cid, _ in cents]
    assert ids != sorted(ids)[:16] or set(ids) != set(range(16)), (
        "centroids are the lowest-id prefix — sampling is not hash-spread"
    )
    sizes = [r.n for r in assigned.groupBy("__cluster").agg(F.count(F.lit(1)).alias("n")).collect()]
    assert max(sizes) <= 2.5 * (sum(sizes) / len(sizes))


def test_lsh_cache_registry_releases(spark, docs):
    """cache_registry collects every persisted intermediate and
    release_caches unpersists them (the long-session storage-leak
    guard)."""
    reg: list = []
    out = D.minhash_lsh_dedup(
        docs, "doc_id", "text", verify_threshold=0.8, cache_registry=reg
    )
    out.count()
    assert reg, "persisted intermediates should be registered"
    assert all(f.storageLevel.useMemory or f.storageLevel.useDisk for f in reg)
    D.release_caches(reg)
    assert reg == []


def test_repetition_stats_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # one token repeated
            (2, "a b c d"),                       # all distinct
            (3, "x y x y x y"),                   # repeated bigrams both ways
            (4, "solo"),                          # no bigrams at all
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in X.repetition_stats(df).collect()}
    assert rows[1].top_token_fraction == 1.0
    # bigrams: ["spam spam"] ×3 → 3 total, 1 distinct → 2/3 duplicated
    assert abs(rows[1].dup_bigram_fraction - 2 / 3) < 1e-12
    assert rows[2].top_token_fraction == 0.25
    assert rows[2].dup_bigram_fraction == 0.0
    # "x y x y x y": bigrams [xy, yx, xy, yx, xy] → 5 total, 2 distinct
    assert rows[3].n_tokens == 6
    assert abs(rows[3].dup_bigram_fraction - 3 / 5) < 1e-12
    assert rows[4].n_tokens == 1 and rows[4].dup_bigram_fraction == 0.0


def test_hash_sample_deterministic_and_rate(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    a = {r.doc_id for r in P.hash_sample(docs, 0.3, "doc_id").select("doc_id").collect()}
    b = {r.doc_id for r in P.hash_sample(docs.repartition(7), 0.3, "doc_id").select("doc_id").collect()}
    assert a == b  # partitioning-independent membership
    n = docs.count()
    assert 0.2 * n < len(a) < 0.4 * n  # ~30% within loose bounds
    other = {r.doc_id for r in P.hash_sample(docs, 0.3, "doc_id", seed=1).select("doc_id").collect()}
    assert other != a  # different seed, different draw


def test_stratified_sample_respects_rates(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = P.stratified_sample(
        docs, "lang", {"en": 1.0, "de": 0.0}, key_col="doc_id", default=0.0
    )
    got = {r.lang for r in out.select("lang").distinct().collect()}
    assert got == {"en"}  # en kept fully, everything else dropped
    assert out.count() == docs.filter("lang = 'en'").count()
    # no shuffle: sampling must plan as filter over the scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_partitions_everyone_and_is_stable(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    out = P.hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    assert out.count() == docs.count()  # total partition, no row lost
    by = {r.doc_id: r.split for r in out.select("doc_id", "split").collect()}
    again = {
        r.doc_id: r.split
        for r in P.hash_split(docs.repartition(5), "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
        .select("doc_id", "split").collect()
    }
    assert by == again  # same assignment under any partitioning
    counts = out.groupBy("split").count().collect()
    frac = {r.split: r["count"] / docs.count() for r in counts}
    assert 0.7 < frac["train"] < 0.9 and frac["val"] < 0.2 and frac["test"] < 0.2
    with pytest.raises(ValueError):
        P.hash_split(docs, "doc_id", {"a": 0.5, "b": 0.4})


def test_upsample_exact_copy_counts(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    up = P.upsample(docs, 2.0, "doc_id")
    assert up.count() == 2 * docs.count()  # integer weight: exact
    per = up.groupBy("doc_id").count().collect()
    assert all(r["count"] == 2 for r in per)
    frac = P.upsample(docs, 0.25, "doc_id")
    assert 0 < frac.count() < docs.count()  # pure downsample via 0<w<1
    assert P.upsample(docs, 0.0, "doc_id").count() == 0


def test_exact_dedup_keep_best_prefers_high_score(spark):
    df = spark.createDataFrame(
        [(1, "same text", 0.2), (2, "same text", 0.9), (3, "other", 0.5)],
        "doc_id long, text string, score double",
    )
    kept = sorted(r.doc_id for r in D.exact_dedup(df, "doc_id", score_col="score").collect())
    assert kept == [2, 3]  # highest score wins, not lowest id
    kept_default = sorted(r.doc_id for r in D.exact_dedup(df, "doc_id").collect())
    assert kept_default == [1, 3]


def test_connected_components_chain_and_isolates(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import graph as G

    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 20]], "id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long")
    expected = {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}
    # union-find fast path, distributed propagation, and star rounds
    # must all agree
    fast = {r.id: r.component for r in G.connected_components(nodes, pairs).collect()}
    dist = {
        r.id: r.component
        for r in G.connected_components(nodes, pairs, driver_threshold=0).collect()
    }
    star = {
        r.id: r.component
        for r in G.connected_components(
            nodes, pairs, driver_threshold=0, algorithm="star"
        ).collect()
    }
    assert fast == expected and dist == expected and star == expected


def test_connected_components_materializes_pairs_once(spark):
    """r15 optimization pin: the driver union-find path persists the
    UNDOUBLED pair list and collects it from cache, so the upstream
    pair pipeline (in production: the full MinHash candidate join +
    Jaccard verification) evaluates exactly once. The old spelling
    doubled into a directed edge list before the materializing count,
    running the pipeline once per union branch — an accumulator on the
    pair source counts evaluated rows and must equal the pair count,
    not 2x it."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import graph as G

    acc = spark.sparkContext.accumulator(0)
    raw = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], "doc_a long, doc_b long"
    )

    def tag(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    pairs = raw.mapInPandas(tag, raw.schema)
    nodes = spark.range(6).select(F.col("id"))
    got = {(r.id, r.component) for r in G.connected_components(nodes, pairs).collect()}
    assert got == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5)}
    assert acc.value == 3, (
        f"pair pipeline evaluated {acc.value} rows for 3 pairs — the "
        f"union-find path must materialize pairs exactly once"
    )


def test_lsh_verify_shingles_cached_once(spark, docs):
    """r15 optimization pin: the Jaccard-verify candidate shingle frame
    is persisted and registered (the two verify joins consume it under
    different aliases, which blocks exchange reuse — unpersisted it ran
    the corpus scan + semi-join + shingling twice per action). Registry
    must now carry sigs + candidate pairs + verify shingles."""
    reg: list = []
    out = D.minhash_lsh_dedup(
        docs, "doc_id", "text", verify_threshold=0.8, cache_registry=reg
    )
    out.count()
    assert len(reg) >= 3, (
        f"expected sigs + pairs + verify-shingle caches registered, got {len(reg)}"
    )
    D.release_caches(reg)


def test_star_components_converge_logarithmically_on_long_path(spark):
    """A 10k-node path graph has diameter 10k — min-label propagation
    would need ~10k rounds, far past max_iter. The large-star/
    small-star rounds must finish within ~log2(n) rounds (Kiveris et
    al. SoCC'14), so max_iter=20 must be enough and every node must
    land in component 0."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import graph as G

    n = 10_000
    nodes = spark.range(n).select(F.col("id"))
    chain = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    out = G.connected_components(
        nodes, chain, driver_threshold=0, algorithm="star", max_iter=20
    )
    comps = out.agg(
        F.countDistinct("component").alias("k"),
        F.max("component").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    assert (comps.k, comps.mx, comps.n) == (1, 0, n)


def test_connected_components_raises_when_iteration_bound_hit(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import graph as G

    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    chain = spark.createDataFrame([(i, i + 1) for i in range(5)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        G.connected_components(nodes, chain, max_iter=2, driver_threshold=0)


def test_transitive_dedup_beats_pairwise_on_star(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import graph as G

    df = spark.createDataFrame([(i, f"row{i}") for i in [1, 2, 3]], "doc_id long, text string")
    # star through 3: pairs (1,3), (2,3) — pairwise keeps {1, 2}, but as
    # an equivalence closure 2 is in 1's cluster and must go
    pairs = spark.createDataFrame([(1, 3), (2, 3)], "doc_a long, doc_b long")
    pairwise = df.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(), "doc_id", "left_anti"
    )
    assert sorted(r.doc_id for r in pairwise.collect()) == [1, 2]
    transitive = G.dedup_by_components(df, pairs, "doc_id")
    assert sorted(r.doc_id for r in transitive.collect()) == [1]


def test_funnel_order_and_gap_semantics(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.events import (
        funnel_counts,
    )

    rows = [
        # user 1: full ordered funnel within gaps
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:05:00", "click"),
        (1, "2024-01-01 10:10:00", "purchase"),
        # user 2: purchase BEFORE click — order violated at step 3
        (2, "2024-01-01 10:00:00", "view"),
        (2, "2024-01-01 10:20:00", "purchase"),
        (2, "2024-01-01 10:30:00", "click"),
        # user 3: click too late (outside the 15-minute gap)
        (3, "2024-01-01 10:00:00", "view"),
        (3, "2024-01-01 11:00:00", "click"),
        # user 4: never viewed
        (4, "2024-01-01 10:00:00", "click"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string, event_type string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    out = {
        r.step: r.n_users
        for r in funnel_counts(ev, ["view", "click", "purchase"], max_gap="'15' MINUTE").collect()
    }
    assert out == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_exists_semantics_uses_later_qualifying_step(spark):
    """A user whose LATER click (still within gap of the view) is the
    one that enables the purchase must count — greedy
    earliest-completion would miss them (the purchase is outside the
    gap of the EARLIEST click but inside the gap of the later one)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.events import (
        funnel_counts,
    )

    rows = [
        (1, "2024-01-01 10:00:00", "view"),
        (1, "2024-01-01 10:10:00", "click"),   # earliest click
        (1, "2024-01-01 10:14:00", "click"),   # later click, still within gap of view
        (1, "2024-01-01 10:27:00", "purchase"),  # >15min after first click, <15min after second
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string, event_type string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    out = {
        r.step: r.n_users
        for r in funnel_counts(ev, ["view", "click", "purchase"], max_gap="'15' MINUTE").collect()
    }
    assert out == {"view": 1, "click": 1, "purchase": 1}


def test_retention_counts_planted_weeks(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.events import (
        retention_counts,
    )

    rows = [
        # user 1: weeks 0, 1, 3 (2024-01-01 is a Monday)
        (1, "2024-01-02 10:00:00", "purchase"),
        (1, "2024-01-09 10:00:00", "purchase"),
        (1, "2024-01-23 10:00:00", "purchase"),
        (1, "2024-01-23 15:00:00", "purchase"),  # same week: counted once
        # user 2: week 0 only (a different calendar week than user 1's)
        (2, "2024-01-10 09:00:00", "purchase"),
        # user 3: never purchases
        (3, "2024-01-02 09:00:00", "view"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string, event_type string").select(
        "user_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    out = {r.week_offset: r.n_users for r in retention_counts(ev, "purchase").collect()}
    assert out == {0: 2, 1: 1, 3: 1}


def test_distinctive_terms_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "zebra zebra common"),   # 'zebra' frequent here, rare in corpus
            (2, "common common apple"),
            (3, "common banana"),
        ],
        "doc_id long, text string",
    )
    out = X.distinctive_terms(df, k=1).collect()
    top = {r.doc_id: (r.token, r.tf, r.doc_freq) for r in out}
    assert top[1] == ("zebra", 2, 1)   # tf 2 / df 1 = 2.0 beats common's 1/3
    assert top[2] == ("apple", 1, 1)   # 1/1 = 1.0 beats common's 2/3
    assert top[3] == ("banana", 1, 1)  # 1/1 = 1.0 beats common's 1/3


def test_winnow_shared_run_guarantee(spark):
    # winnowing guarantee: a shared token run of length >= w+k-1 (= 6
    # for k=3, w=4) must produce at least one shared fingerprint
    shared = "alpha beta gamma delta epsilon zeta"
    df = spark.createDataFrame(
        [
            (1, f"one two {shared} three"),
            (2, f"{shared} nine ten eleven"),
            (3, "totally unrelated words with no overlap at all here"),
            (4, "tiny doc"),  # below k+w-1 tokens: no fingerprints
        ],
        "doc_id long, text string",
    )
    fps = X.winnow_fingerprints(df, k=3, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]            # overlap detected
    assert not (by_doc[1] & by_doc[3])      # unrelated: disjoint
    assert 4 not in by_doc                  # too short to fingerprint


def test_cap_tokens_per_group_budget_semantics(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P

    df = spark.createDataFrame(
        [(1, "a", 300), (2, "a", 300), (3, "a", 300), (4, "b", 900), (5, "b", 100)],
        "doc_id long, source string, n_tokens int",
    )
    # explicit best-first order: ascending doc_id
    out = P.cap_tokens_per_group(
        df, "source", "n_tokens", budget=700, order_by=[F.col("doc_id").asc()]
    )
    got = {r.source: sorted([x.doc_id for x in g]) for r, g in []} or {
        s: sorted(r.doc_id for r in out.filter(F.col("source") == s).collect())
        for s in ("a", "b")
    }
    # a: 300+300=600 <= 700, third row crosses -> dropped; b: 900 > 700 drops all after? first row 900 > 700 -> dropped, 900+100 also
    assert got["a"] == [1, 2]
    assert got["b"] == []
    totals = (
        out.groupBy("source").agg(F.sum("n_tokens").alias("t")).collect()
    )
    assert all(r.t <= 700 for r in totals)
    # key_col default ordering is deterministic across repartition
    o1 = sorted(r.doc_id for r in P.cap_tokens_per_group(df, "source", "n_tokens", 700, key_col="doc_id").collect())
    o2 = sorted(r.doc_id for r in P.cap_tokens_per_group(df.repartition(7), "source", "n_tokens", 700, key_col="doc_id").collect())
    assert o1 == o2


def test_deterministic_order_stable_across_partitioning(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = [r.doc_id for r in P.deterministic_order(df, "doc_id").collect()]
    b = [r.doc_id for r in P.deterministic_order(df.repartition(13), "doc_id").collect()]
    assert a == b
    assert a != sorted(a)  # genuinely shuffled, not id order


def test_cross_ngram_contamination_finds_planted_leak(spark):
    train = spark.createDataFrame(
        [(10, BASE), (11, OTHER), (12, "unrelated words entirely here today")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, BASE), (101, "totally disjoint vocabulary sentence structure")],
        "doc_id long, text string",
    )
    rows = {r.eval_id: r for r in D.cross_ngram_contamination(train, ev).collect()}
    # the leaked doc matches its source exactly
    assert rows[100].train_id == 10 and rows[100].max_overlap == 1.0
    # the clean doc shares no 3-gram shingle with any train doc
    assert 101 not in rows or rows[101].max_overlap < 0.2


def test_pack_sequences_semantics(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P

    df = spark.createDataFrame(
        [(i, n) for i, n in enumerate([100, 200, 150, 60, 500, 90])],
        "doc_id long, n_tokens int",
    )
    out = P.pack_sequences(df, "doc_id", "n_tokens", capacity=256, num_shards=2)
    rows = out.collect()
    assert len(rows) == 6  # every doc packed exactly once
    assert sum(r.n_tokens for r in rows) == 1100  # token mass preserved
    by_bin: dict = {}
    for r in rows:
        by_bin.setdefault(r.bin_id, []).append(r)
    for rs in by_bin.values():
        if any(r.oversize for r in rs):
            assert len(rs) == 1  # oversized doc is alone in its bin
        else:
            assert sum(r.n_tokens for r in rs) <= 256
            # offsets are a proper prefix layout inside the bin
            assert sorted(r.bin_offset for r in rs) == [
                o for o in __import__("itertools").accumulate(
                    [0] + [r.n_tokens for r in sorted(rs, key=lambda x: x.bin_offset)][:-1]
                )
            ]
    assert [r.oversize for r in rows if r.n_tokens == 500] == [True]
    # deterministic under repartitioning
    again = sorted(
        (r.doc_id, r.bin_id, r.bin_offset)
        for r in P.pack_sequences(
            df.repartition(5), "doc_id", "n_tokens", capacity=256, num_shards=2
        ).collect()
    )
    assert again == sorted((r.doc_id, r.bin_id, r.bin_offset) for r in rows)


def test_pii_scrub_counts_and_redacts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@corp.example.org today"),
            (2, "server 192.168.1.77 and backup 10.0.0.1 are up"),
            (3, "call +1 555-123-4567 now"),
            (4, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in X.pii_scrub(df).collect()}
    assert rows[1].n_email == 1 and "<EMAIL>" in rows[1].text
    assert "jane.doe" not in rows[1].text
    assert rows[2].n_ipv4 == 2 and rows[2].text.count("<IPV4>") == 2
    assert rows[3].n_phone == 1 and "<PHONE>" in rows[3].text
    assert rows[4].text == "nothing sensitive here"
    assert (rows[4].n_email, rows[4].n_ipv4, rows[4].n_phone) == (0, 0, 0)


def test_chunk_documents_overlap_and_coverage(spark):
    text = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, ""), (3, "a b"), (4, "Mixed CASE\n tokens Here")],
        "doc_id long, text string",
    )
    out = X.chunk_documents(df, chunk_tokens=4, overlap_tokens=1).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: stride 3 -> starts 0,3,6 (start 9's lone token w9 is
    # already inside chunk 2 — the degenerate tail is suppressed)
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    assert [r.chunk_text for r in c1] == [
        "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9",
    ]
    assert [r.n_chunk_tokens for r in c1] == [4, 4, 4]
    # consecutive chunks overlap by exactly one token; every token of
    # the doc appears in some chunk
    assert c1[0].chunk_text.split()[-1] == c1[1].chunk_text.split()[0]
    covered = {t for r in c1 for t in r.chunk_text.split()}
    assert covered == {f"w{i}" for i in range(10)}
    # empty doc -> no rows; short doc -> one partial chunk
    assert 2 not in by_doc
    assert [r.chunk_text for r in by_doc[3]] == ["a b"]
    # token text is preserved verbatim (no lowercasing); whitespace
    # runs normalize to single spaces
    assert [r.chunk_text for r in by_doc[4]] == ["Mixed CASE tokens Here"]
    with pytest.raises(ValueError):
        X.chunk_documents(df, chunk_tokens=4, overlap_tokens=4)


# ---------------------------------------------------------------- image headers


def _png_bytes(w, h):
    import struct, zlib

    def chunk(tag, data):
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def _jpeg_bytes(w, h, extra_segments=1):
    import struct

    app0 = (b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(64)
    sof = (b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
           + struct.pack(">HH", h, w)
           + b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    return b"\xff\xd8" + app0 + dqt * extra_segments + sof + b"\xff\xd9"


def test_image_header_meta_on_genuine_file_bytes(spark):
    """The parser must invert REAL encodings, not just its own
    synthesizer: a valid zlib-compressed PNG, a baseline JPEG whose SOF
    sits behind APP0+DQT segments, a GIF87a, and a top-down BMP
    (negative int32 height — the case an ANSI int cast would throw on).
    Garbage and NULL payloads yield NULLs, never errors."""
    import struct

    gif = b"GIF87a" + struct.pack("<HH", 320, 200) + b"\x00\x00\x00\x3b"
    bmp = (b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
           + struct.pack("<IiiHH", 40, 800, -600, 1, 24) + bytes(40))
    rows = [
        (1, bytearray(_png_bytes(640, 480))),
        (2, bytearray(_jpeg_bytes(1024, 768))),
        (3, bytearray(gif)),
        (4, bytearray(bmp)),
        (5, bytearray(b"not an image")),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r["doc_id"]: (r["format"], r["width"], r["height"])
        for r in M.image_header_meta(df, "content").collect()
    }
    assert got[1] == ("png", 640, 480)
    assert got[2] == ("jpeg", 1024, 768)
    assert got[3] == ("gif", 320, 200)
    assert got[4] == ("bmp", 800, 600)
    assert got[5] == (None, None, None)
    assert got[6] == (None, None, None)


def test_jpeg_segment_walk_bound(spark):
    """A JPEG whose SOF hides behind more segments than max_segments
    returns NULL dims (bounded work per row) — not a wrong answer, not
    an unbounded scan; a deeper chain within the bound still parses."""
    deep_ok = _jpeg_bytes(99, 44, extra_segments=30)
    too_deep = _jpeg_bytes(99, 44, extra_segments=60)
    df = spark.createDataFrame(
        [(1, bytearray(deep_ok)), (2, bytearray(too_deep))],
        "doc_id long, content binary",
    )
    got = {
        r["doc_id"]: (r["format"], r["width"], r["height"])
        for r in M.image_header_meta(df, "content").collect()
    }
    assert got[1] == ("jpeg", 99, 44)
    assert got[2] == ("jpeg", None, None)


def test_synthesize_image_bytes_roundtrip(spark):
    """Synthesizer and parser agree across all four formats and the
    SOF0/SOF2 split; dimensions survive the byte round-trip exactly."""
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (16 + F.col("id") % 509).alias("w"),
        (16 + (F.col("id") * 7) % 389).alias("h"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("gif"), F.lit("bmp")),
            (F.col("id") % 4 + 1).cast("int"),
        ).alias("fmt"),
    )
    synth = df.withColumn(
        "content", M.synthesize_image_bytes(F.col("w"), F.col("h"), F.col("fmt"))
    )
    parsed = M.image_header_meta(synth, "content")
    bad = parsed.filter(
        (F.col("format") != F.col("fmt"))
        | (F.col("width") != F.col("w"))
        | (F.col("height") != F.col("h"))
    ).count()
    assert bad == 0


def test_trigram_language_id_beats_stopword_tier(spark):
    """Cavnar-Trenkle rank profiles classify sentences that contain NO
    stopword-list words — exactly where the old tier defaults to
    'und'. Planted set: two sentences per language avoiding every
    stopword, plus CJK and garbage rows; the trigram path must get all
    ten right while the stopword tier (kept as the cheap fallback)
    manages only the script-gated and degenerate rows."""
    rows = [
        (1, "en", "seven quick foxes jumped over three sleeping dogs near our old wooden barn yesterday"),
        (2, "de", "gestern kauften wir frisches brot beim kleinen baecker am marktplatz unserer schoenen stadt"),
        (3, "fr", "hier nous avons achete du pain frais chez notre boulanger pres du marche municipal"),
        (4, "es", "ayer compramos pan fresco donde nuestro panadero cerca del mercado municipal"),
        (5, "en", "my grandmother reads long stories every evening while her cat sleeps quietly beside her chair"),
        (6, "de", "meine grossmutter liest jeden abend lange geschichten waehrend ihre katze leise neben ihrem stuhl schlaeft"),
        (7, "fr", "ma grand mere lit de longues histoires chaque soir pendant son chat dort tranquillement"),
        (8, "es", "mi abuela lee largas historias cada noche mientras su gato duerme tranquilamente junto a su silla"),
        (9, "zh", "今天天气很好我们去公园散步然后喝茶"),
        (10, "und", "12345 67890 !!! ???"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, truth string, text string")
    tri = {r.doc_id: r.lang_pred for r in X.language_id_trigram(df).collect()}
    sw = {r.doc_id: r.lang_pred for r in X.language_id_stopword(df).collect()}
    truth = {i: t for i, t, _ in rows}
    tri_ok = sum(tri[i] == truth[i] for i in truth)
    sw_ok = sum(sw[i] == truth[i] for i in truth)
    assert tri_ok == 10, (tri, truth)
    assert tri_ok > sw_ok, (tri_ok, sw_ok)
    # the default entry point dispatches to the trigram path
    dflt = {r.doc_id: r.lang_pred for r in X.language_id(df).collect()}
    assert dflt == tri


def test_trigram_profiles_are_well_formed():
    """Import-time profile invariants: every language ships exactly
    PROFILE_SIZE trigrams of length 3, ranks are 1..PROFILE_SIZE, and
    the profiles are pairwise distinct (a duplicated seed would make
    two languages indistinguishable)."""
    for lang, prof in X.LANG_PROFILES.items():
        assert len(prof) == X.PROFILE_SIZE, lang
        assert all(len(tg) == 3 for tg in prof), lang
        assert sorted(prof.values()) == list(range(1, X.PROFILE_SIZE + 1)), lang
    profs = list(X.LANG_PROFILES.values())
    for i in range(len(profs)):
        for j in range(i + 1, len(profs)):
            assert profs[i] != profs[j]


def _wav_bytes(n_samples=1600, sr=8000):
    """Minimal genuine RIFF/WAVE, 16-bit PCM mono: a constant half-scale
    square value so RMS is exactly 0.5 in float convention."""
    import struct

    pcm = struct.pack("<" + "h" * n_samples, *([16384] * n_samples))
    hdr = (b"RIFF" + struct.pack("<I", 36 + len(pcm)) + b"WAVE"
           + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16)
           + b"data" + struct.pack("<I", len(pcm)))
    return hdr + pcm


def test_decode_image_real_kernel_when_pil_present(spark):
    """With PIL installed the decode kernel must run the REAL decode on
    genuine PNG bytes (and NULL-out undecodable blobs); skips where no
    codec exists — the deterministic-fake path is covered above."""
    pytest.importorskip("PIL")
    df = spark.createDataFrame(
        [(1, bytearray(_png_bytes(10, 6))), (2, bytearray(b"junk"))],
        "doc_id long, content binary",
    ).select("doc_id", F.struct(F.col("content").alias("content")).alias("media"))
    got = {r["id"]: r for r in M.decode_image_batch(df, size=(4, 4)).collect()}
    assert got[1]["height"] == 4 and got[1]["width"] == 4 and got[1]["channels"] == 3
    # the planted PNG is constant (0x10, 0x20, 0x30) per pixel -> exact sum
    assert got[1]["pixel_sum"] == (0x10 + 0x20 + 0x30) * 4 * 4
    assert got[2]["height"] is None and got[2]["pixel_sum"] is None


def test_extract_audio_real_kernel_when_soundfile_present(spark):
    pytest.importorskip("soundfile")
    df = spark.createDataFrame(
        [(1, bytearray(_wav_bytes())), (2, bytearray(b"junk"))],
        "doc_id long, content binary",
    ).select("doc_id", F.struct(F.col("content").alias("content")).alias("media"))
    got = {r["id"]: r for r in M.extract_audio_features(df).collect()}
    assert got[1]["n_samples"] == 1600 and got[1]["sample_rate"] == 8000
    assert abs(got[1]["rms"] - 0.5) < 1e-3
    assert got[2]["n_samples"] is None


# ---------------------------------------------------------------- semantic dedup
def _planted_vectors(spark):
    """Three duplicate groups of near-identical vectors plus singletons.
    Group members differ by a tiny perturbation (cosine > 0.999)."""
    import math

    base = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.0, 0.0, 1.0, 0.0],
    }
    rows = []
    vid = 0
    for g, vec in base.items():
        for j in range(3):  # 3 near-copies per group
            eps = 1e-4 * (j + 1)
            v = [x + eps if i == (g + 1) % 4 else x for i, x in enumerate(vec)]
            norm = math.sqrt(sum(x * x for x in v))
            rows.append((vid, [x / norm for x in v]))
            vid += 1
    # far-away singletons (negative directions — cosine <= 0 to all groups)
    for vec in ([-1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, -1.0]):
        rows.append((vid, vec))
        vid += 1
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


def test_semantic_dedup_keeps_lowest_id_per_planted_group(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    df = _planted_vectors(spark)
    surv = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, threshold=0.99, num_buckets=4, probe=2, refine_rounds=0
        ).collect()
    )
    # groups {0,1,2} {3,4,5} {6,7,8} -> keep 0, 3, 6; singletons 9, 10 stay
    assert surv == [0, 3, 6, 9, 10]


def test_semantic_dedup_transitive_collapses_chain(spark):
    """A chain a≈b≈c where a and c are NOT direct near-dups: greedy and
    transitive agree here (b and c both pair with a lower id), so build
    the chain so only consecutive members pair: transitive must keep
    exactly the minimum, greedy may keep the chain ends."""
    import math

    # unit vectors at angles 0, 20, 40 degrees: cos(20deg)=0.94 pairs
    # consecutive members at theta=0.9; cos(40deg)=0.766 keeps the ends apart
    rows = []
    for i, deg in enumerate([0.0, 20.0, 40.0]):
        rad = math.radians(deg)
        rows.append((i, [math.cos(rad), math.sin(rad), 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    greedy = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, threshold=0.9, num_buckets=1, probe=1, refine_rounds=0
        ).collect()
    )
    assert greedy == [0]  # 1 pairs with 0, 2 pairs with 1 -> both dropped
    trans = sorted(
        r.vec_id
        for r in semantic_dedup(
            df, threshold=0.9, num_buckets=1, probe=1, refine_rounds=0,
            transitive=True,
        ).collect()
    )
    assert trans == [0]


def test_semantic_dedup_survivors_guarded_branch(spark, monkeypatch):
    """Above `_SEMDEDUP_VERIFY_CAP` the registry query must switch to
    the guarded shape: production bucketed survivors of the FULL corpus
    + exact-vs-bucketed superset verification on the xxhash64-gated
    subsample (the branch only sf1-scale data exercises otherwise —
    SCALE.md decade, the 290 s quadratic). Shrinking the cap below the
    sf0.001 corpus (500 vectors) forces the branch; the survivor set
    must stay a subset of the corpus, keep the query's schema, and the
    in-query invariant must still evaluate TRUE."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark import (
        queries as q,
        queries_text,
    )

    monkeypatch.setattr(queries_text, "_SEMDEDUP_VERIFY_CAP", 100)
    q.register_all()
    out = q.QUERIES["semantic_dedup_survivors"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert out and all(r.bucketed_superset_ok for r in out)
    ids = [r.vec_id for r in out]
    assert len(set(ids)) == len(ids) <= 500
    assert ids == sorted(ids)  # orderBy("vec_id") contract


def test_semantic_dedup_production_superset_of_exact(spark):
    """The r14 benched row (production bucketed pipeline alone,
    corpus-scaled buckets): survivors are unique, sorted, and a
    SUPERSET of the exact all-pairs survivors — bucketed pairs are a
    subset of exact pairs by construction, so the greedy drop removes
    at most the exact losers. (The oracle-backed three-pipeline
    invariant query `semantic_dedup_survivors` remains the correctness
    gate; this pins the rows-only benched twin to the same guarantee.)"""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark import queries as q

    q.register_all()
    sf = "/root/testdata/sf0.001"
    out = q.QUERIES["semantic_dedup_production"](spark, sf).collect()
    ids = [r.vec_id for r in out]
    assert ids and ids == sorted(ids) and len(set(ids)) == len(ids)
    emb = spark.read.parquet(sf + "/embeddings.parquet")
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    exact = {
        r.vec_id
        for r in semantic_dedup(
            emb, threshold=0.4, num_buckets=1, probe=1, refine_rounds=0
        ).select("vec_id").collect()
    }
    assert exact <= set(ids)


def test_semantic_dedup_preserves_all_columns(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
        semantic_dedup,
    )

    df = _planted_vectors(spark).withColumn("extra", F.lit("x"))
    out = semantic_dedup(df, threshold=0.99, num_buckets=2, probe=2, refine_rounds=0)
    assert out.columns == ["vec_id", "embedding", "extra"]


# ----------------------------------------------------- repeated-span excision
def _span_docs(spark):
    boiler = "all rights reserved contact us at example site footer text"  # 10 tokens
    rows = [
        (0, f"alpha beta gamma {boiler} delta epsilon zeta eta theta"),
        (1, f"one two three four {boiler} five six seven eight nine"),
        (2, "totally unique content with no shared windows anywhere in sight at all"),
        (3, "tiny doc"),  # shorter than k -> no windows, no crash
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_repeated_span_stats_finds_and_merges(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        repeated_span_stats,
    )

    got = {
        r.doc_id: r
        for r in repeated_span_stats(_span_docs(spark), k=8, min_docs=2).collect()
    }
    assert len(got) == 4
    # the 10-token boilerplate yields 3 overlapping 8-grams -> ONE span
    # of 10 tokens in each of docs 0 and 1
    assert got[0].n_spans == 1 and got[0].n_removed == 10
    assert got[1].n_spans == 1 and got[1].n_removed == 10
    assert got[2].n_spans == 0 and got[2].n_removed == 0
    assert got[3].n_spans == 0 and got[3].n_removed == 0


def test_excise_repeated_spans_removes_only_boilerplate(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        excise_repeated_spans,
    )

    out = {
        r.doc_id: r
        for r in excise_repeated_spans(_span_docs(spark), k=8, min_docs=2).collect()
    }
    assert out[0].text == "alpha beta gamma delta epsilon zeta eta theta"
    assert out[1].text == "one two three four five six seven eight nine"
    assert out[0].n_removed == 10 and out[1].n_removed == 10
    # untouched docs come back byte-identical
    assert out[2].text.startswith("totally unique") and out[2].n_removed == 0
    assert out[3].text == "tiny doc" and out[3].n_removed == 0


def test_excise_keep_first_leaves_one_copy(spark):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        excise_repeated_spans,
    )

    out = {
        r.doc_id: r
        for r in excise_repeated_spans(
            _span_docs(spark), k=8, min_docs=2, keep="first"
        ).collect()
    }
    # doc 0 is the lowest id containing the boilerplate: it keeps it
    assert "all rights reserved" in out[0].text and out[0].n_removed == 0
    assert "all rights reserved" not in out[1].text and out[1].n_removed == 10
    assert out[1].text == "one two three four five six seven eight nine"


def test_wav_header_meta_on_genuine_file_bytes(spark):
    """The WAV parser must invert a REAL wave-module encoding (stdlib
    `wave` writes canonical RIFF/PCM), a hand-built file with a LIST
    chunk interposed before data, and yield NULLs for garbage/NULL."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)  # 16-bit
        wf.setframerate(44100)
        wf.writeframes(b"\x00\x00" * 2 * 441)  # 441 frames, 10 ms
    real = buf.getvalue()

    def le16(v): return struct.pack("<H", v)
    def le32(v): return struct.pack("<I", v)
    listy = (
        b"RIFF" + le32(36 + 14 + 800) + b"WAVE"
        + b"fmt " + le32(16) + le16(1) + le16(1) + le32(8000)
        + le32(8000 * 1) + le16(1) + le16(8)
        + b"LIST" + le32(6) + b"INFOxy"
        + b"data" + le32(800)
    )
    rows = [
        (1, bytearray(real)),
        (2, bytearray(listy)),
        (3, bytearray(b"RIFFxxxxNOPE")),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    got = {
        r["doc_id"]: (r["channels"], r["sample_rate"], r["bits"],
                      r["n_frames"], r["duration_ms"])
        for r in M.wav_header_meta(df, "content").collect()
    }
    assert got[1] == (2, 44100, 16, 441, 10)
    assert got[2] == (1, 8000, 8, 800, 100)
    assert got[3] == (None, None, None, None, None)
    assert got[4] == (None, None, None, None, None)


def test_synthesize_wav_bytes_roundtrip(spark):
    """Synthesizer and parser agree with and without the LIST chunk."""
    rows = [(i, 8000 * (1 + i % 6), 1 + i % 2, [8, 16, 24, 32][i % 4],
             100 + 37 * i, i % 3 == 0) for i in range(24)]
    df = spark.createDataFrame(
        rows, "doc_id long, rate long, ch long, bits long, frames long, lst boolean"
    ).withColumn(
        "content",
        M.synthesize_wav_bytes(
            F.col("rate"), F.col("ch"), F.col("bits"), F.col("frames"),
            with_list_chunk=F.col("lst"),
        ),
    )
    out = M.wav_header_meta(df, "content").collect()
    for r in out:
        assert (r["channels"], r["sample_rate"], r["bits"], r["n_frames"]) == (
            r["ch"], r["rate"], r["bits"], r["frames"]
        )
        assert r["duration_ms"] == r["frames"] * 1000 // r["rate"]


def test_repeated_span_hash_windows_parity(spark):
    """The xxhash64 window-key fast path must produce IDENTICAL spans
    and excised text to the string-key path (collisions aside, and a
    planted corpus has none) — same invariant family as the
    minhash/simhash fast-path parity pins."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        excise_repeated_spans,
        repeated_span_stats,
    )

    docs = _span_docs(spark)
    a = sorted(map(tuple, repeated_span_stats(docs, k=8, min_docs=2).collect()))
    b = sorted(map(tuple, repeated_span_stats(
        docs, k=8, min_docs=2, hash_windows=True).collect()))
    assert a == b
    ea = sorted(map(tuple, excise_repeated_spans(
        docs, k=8, min_docs=2, keep="first").collect()))
    eb = sorted(map(tuple, excise_repeated_spans(
        docs, k=8, min_docs=2, keep="first", hash_windows=True).collect()))
    assert ea == eb


def test_token_frequency_stats_flags_gibberish(spark):
    """A doc of corpus-unique junk tokens must score lower mean corpus
    frequency and higher rare-ratio than docs of shared vocabulary."""
    rows = [(i, "the cat sat on the mat and the dog ran") for i in range(5)]
    rows.append((99, "xq7zk vprw9 qqjjx zzt0p wkvnm"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in X.token_frequency_stats(df).collect()}
    junk, normal = got[99], got[0]
    assert junk.mean_tok_freq < normal.mean_tok_freq
    assert junk.rare_ratio == 1.0
    assert normal.rare_ratio < 0.5


def test_temperature_mix_upweights_small_sources(spark):
    """alpha=0.5 must give a small source MORE than its proportional
    share and a dominant source less; alpha=1.0 is proportional; the
    selection is deterministic across re-runs."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.sampling import (
        temperature_mix,
    )

    rows = [(i, "big") for i in range(900)] + [(1000 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mixed = temperature_mix(df, "source", "doc_id", budget_docs=100, alpha=0.5)
    by_src = {r.source: r for r in mixed.groupBy("source").count().collect()}
    # proportional would give small 10 of 100; sqrt-weights give 25
    assert by_src["small"]["count"] == 25
    assert by_src["big"]["count"] == 75
    prop = temperature_mix(df, "source", "doc_id", budget_docs=100, alpha=1.0)
    by_prop = {r.source: r["count"] for r in prop.groupBy("source").count().collect()}
    assert by_prop == {"big": 90, "small": 10}
    again = temperature_mix(df, "source", "doc_id", budget_docs=100, alpha=0.5)
    assert sorted(r.doc_id for r in again.collect()) == sorted(
        r.doc_id for r in mixed.collect()
    )
