"""Deduplication operators for training-data pipelines: exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design notes (the point of each algorithm):
- exact: one shuffle on a 128-bit fingerprint — trivially scales.
- n-gram Jaccard: inverted-index self-join (explode shingles → join on
  shingle → count per pair). Never a cross join; the shuffle key is the
  shingle, and ubiquitous shingles are capped (stop-shingle cut) so no
  reducer sees a quadratic bucket.
- MinHash+LSH: per-doc signature (narrow), band → bucket join —
  candidate pairs only within equal band hashes, verification only on
  candidates. The only shuffle is on band keys.
- SimHash: 64-bit per doc, near-dups = equal bands of the hash
  (Hamming-ball probing via band rotation).
- embedding cosine: exact-decimal dot products; pairs via a block
  join on an LSH-ish bucket (sign of first principal dims) or brute
  force for small corpora.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
    fingerprint_md5,
    normalized,
    spread_small_scan as _ensure_parallelism,
    tokens,
    zipped_token_grams as _zipped_grams_impl,
)

# Decimal accumulator for exact dot products: scale 12 is preserved by
# addition (values are tiny), precision 30 leaves headroom so the
# per-step cast back to the accumulator type never changes a value —
# the fold stays exact and order-independent.
_DEC12 = T.DecimalType(30, 12)


def release_caches(cache_registry: list[DataFrame]) -> None:
    """Unpersist every frame a dedup call registered (see the
    ``cache_registry`` parameter on ``minhash_lsh_pairs`` /
    ``minhash_lsh_dedup``) and clear the list. Call after the FINAL
    action on the returned frame — the caches exist to avoid
    recomputation across the multiple consumers inside one job, and
    holding them longer just pins executor storage."""
    for frame in cache_registry:
        frame.unpersist(blocking=False)
    cache_registry.clear()


def exact_dedup(
    df: DataFrame, id_col: str, text_col: str = "text",
    score_col: str | None = None,
    keep_cols: "Sequence[str] | None" = None,
) -> DataFrame:
    """Keep one representative per normalized-content fingerprint.
    Default policy: lowest id. With ``score_col``: the highest-scoring
    duplicate survives (curation keeps the best copy — e.g. quality
    score — not an arbitrary one), id ascending as the deterministic
    tie-break. One shuffle either way.

    ``keep_cols`` narrows the RETURNED columns (survivor selection is
    unchanged — same fingerprint, same ordering key). Pass it whenever
    the consumer projects afterward: the survivor row travels through
    the dedup shuffle as an opaque aggregate/window payload Catalyst
    cannot prune into, so without it the fat ``text_col`` crosses the
    exchange only to be dropped (r16: pruning to 3 columns measured
    0.57 -> 0.49 s at sf0.1 and 0.61 -> 0.55 s at the sf1 decade; at
    100 TB the shuffle shrinks by roughly the corpus text mass).

    Precondition: ``id_col`` must be non-null (every corpus here keys
    rows by a required id). The min_by spelling SKIPS null ordering
    keys, so an all-null-id fingerprint group would yield a fabricated
    all-NULL row where the old ranking window kept a real null-id row
    (NULLS FIRST) — the 'survivor rows identical' equivalence below is
    stated under this precondition (ADVICE r15)."""
    out_cols = list(keep_cols) if keep_cols is not None else list(df.columns)
    # normalization + md5 happen BEFORE the fingerprint shuffle, so
    # an under-partitioned scan must be spread first or that narrow
    # work serializes (the sf1 decade measured 13x for 10x data on
    # a single-row-group file); at scale the spread is a no-op
    base = _ensure_parallelism(df, id_col).withColumn(
        "__fp", fingerprint_md5(text_col)
    )
    if score_col is None:
        # keep-lowest-id as a min_by AGGREGATE, not a ranking window:
        # the aggregate partially combines map-side (each map task
        # forwards one candidate row per fingerprint it saw) and the
        # reduce side never sorts — the window spelling shuffles every
        # row and pays an Exchange + full Sort before row_number
        # (r15: ~15% faster at sf0.1, and at scale duplicate-heavy
        # fingerprints collapse before the exchange). Survivor rows are
        # identical: min_by on the id is exactly rank-1 of (id asc).
        # (r16: the hash-aggregable min(id)-then-semi-join spelling was
        # measured SLOWER at sf0.1 AND sf1 — 0.57 vs 0.49 / 0.67 vs
        # 0.55 s — because it re-scans the corpus for the join; the
        # SortAggregate over one candidate row per fp per task is not
        # the bound, shuffle bytes are.)
        return (
            base.groupBy("__fp")
            .agg(F.min_by(F.struct(*out_cols), F.col(id_col)).alias("__r"))
            .select("__r.*")
        )
    # keep-best needs (score desc, id asc) — a two-key MIXED-direction
    # order no single min_by/max_by key expresses for arbitrary score
    # types, so the ranking-window spelling stays. Unlike the min_by
    # struct, a Window is NOT opaque to Catalyst — column pruning
    # already pushes the consumer's projection below the window
    # exchange (verified in plans/r16/dedup_keep_best_documents_*:
    # the exchange carries 4 narrow columns in BOTH spellings) — so
    # keep_cols here only narrows the RETURNED frame and keeps the
    # API symmetric with the min_by path.
    need = list(dict.fromkeys(out_cols + [score_col, id_col]))
    w = Window.partitionBy("__fp").orderBy(
        F.col(score_col).desc(), F.col(id_col).asc()
    )
    return (
        base.select("__fp", *need)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*out_cols)
    )


def _zipped_grams(col: Column | str, n: int) -> Column:
    """Gram windows via shifted-slice zips (text.zipped_token_grams —
    see there for the interpreted-HOF CSE rationale). Downstream hashes
    are bit-identical to the old per-position-slice spelling (pinned by
    tests/test_training_ops.py)."""
    return _zipped_grams_impl(col, n)


def _gram_guard_sql(quoted: str, n: int, gram_body: str, elem_type: str) -> str:
    """CASE WHEN size(tokens) >= n THEN array_distinct(transform(zip,
    s -> <gram_body>)) ELSE empty — the shared single-expr spelling of
    the two shingle builders (see text.py's fast-path rationale)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        _tokens_sql,
        _zipped_grams_sql,
    )

    zipped = _zipped_grams_sql(quoted, n)
    return (
        f"CASE WHEN size({_tokens_sql(quoted)}) >= {n} "
        f"THEN array_distinct(transform({zipped}, s -> {gram_body})) "
        f"ELSE CAST(array() AS array<{elem_type}>) END"
    )


def _gram_concat_sql(n: int) -> str:
    fields = ", ".join(f"s['{k}']" for k in range(n))
    return f"concat_ws(' ', {fields})"


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the normalized text."""
    if isinstance(col, str):
        from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
            _quote_ident,
        )

        return F.expr(
            _gram_guard_sql(_quote_ident(col), n, _gram_concat_sql(n), "string")
        )
    grams = F.transform(
        _zipped_grams(col, n),
        lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)]),
    )
    return F.when(F.size(tokens(col)) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def word_ngram_hashes(col: Column | str, n: int = 3) -> Column:
    """Distinct 64-bit hashes of word n-gram shingles — the fast-path
    twin of ``word_ngrams`` for operators that only need shingle
    EQUALITY (inverted-index joins, doc-frequency counts, semi-joins).
    Hashes the space-joined gram INSIDE the same transform lambda: the
    gram string never leaves the expression, and everything downstream
    of the shingling — explode, shuffle, join — carries 8-byte longs
    instead of ~n-word strings. Space-separated concat keeps token
    boundaries, so "a b"+"c" vs "a"+"b c" cannot collide by
    construction; distinct grams collide only via 64-bit xxhash64
    (negligible at any corpus size that fits a cluster). Gram windows
    come from ``_zipped_grams`` (see there for why shifted-slice zips
    beat per-position slices in the interpreted HOF path by 4-6x)."""
    if isinstance(col, str):
        from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
            _quote_ident,
        )

        return F.expr(
            _gram_guard_sql(
                _quote_ident(col),
                n,
                f"xxhash64({_gram_concat_sql(n)})",
                "bigint",
            )
        )
    grams = F.transform(
        _zipped_grams(col, n),
        lambda s: F.xxhash64(F.concat_ws(" ", *[s[str(k)] for k in range(n)])),
    )
    return F.when(F.size(tokens(col)) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<bigint>")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_freq: int | None = None,
    max_candidate_pairs: int | None = 50_000_000,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """All document pairs with n-gram Jaccard ≥ threshold, via the
    inverted-index self-join (no cross join at any scale).

    When the tier-2 candidate guard runs (see below) it persists the
    shingled frame so the estimator job and the executed plan share one
    tokenize+hash scan. Pass ``cache_registry`` (a list) to receive
    that persisted frame and call ``release_caches`` after the final
    action on the returned frame — otherwise the pin lives until
    session teardown (long-lived sessions invoking many guarded calls
    should always pass a registry).

    ``max_shingle_freq`` drops shingles appearing in more than that
    many documents (stop-shingle cut): they contribute O(freq²) pair
    candidates while carrying almost no signal. At 100 TB this cap is
    what keeps the pair-generation shuffle bounded.

    ``max_candidate_pairs`` is the default-on safety rail (VERDICT r8
    ask #5), two-tiered (r10): first an O(docs) pre-check (one cheap
    map-side agg, no explode) proves P·(n−1)/2 ≤ cap where P is total
    postings and n the doc count — the common small-corpus call never
    pays the estimator. Only when that loose bound exceeds the cap does
    the exact estimator run: one agg job over the (post-cap) shingle
    frequency table computes Σ f·(f−1)/2 — an upper bound on candidate
    join rows — with the shingled frame persisted so the estimate and
    the executed plan share one tokenize+hash scan. The operator
    REFUSES with a ``ValueError`` when the estimate exceeds the bound,
    naming the escape hatches (tighten ``max_shingle_freq``, switch to
    ``minhash_lsh_dedup`` whose cost is candidates-first, or pass
    ``max_candidate_pairs=None`` to accept the quadratic knowingly).
    A default-invoked call on a saturated corpus can no longer silently
    go quadratic; the exact metric itself is never altered — the guard
    only gates execution. Mirrors ``embedding_near_dup_pairs.max_rows``.

    The inverted index carries 64-bit shingle HASHES
    (``word_ngram_hashes``), not gram strings — everything shuffled or
    joined past the shingling is 8-byte longs instead of ~3-word
    strings. Set sizes and common counts both come from the hash
    arrays, so the Jaccard is exact up to 64-bit collisions —
    ~(distinct shingles)²/2⁶⁵, immaterial at any corpus size a cluster
    holds — and the sf0.01 DuckDB oracle (string-exact brute force)
    still matches row-for-row.

    Cost model, measured on a saturated-vocabulary corpus (sf1 decade,
    SCALE.md): the common-count aggregation is Ω(distinct co-occurring
    pairs). On natural corpora that set is sparse (near-dups + shared
    stop-shingles, which the cap removes); on a corpus whose shingle
    space stops growing it is dense and NO plan avoids the quadratic —
    that regime belongs to MinHash LSH (candidates first, count later)
    or the cap. This operator is the exact-metric spelling.
    """
    sh = (
        _ensure_parallelism(
            df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
        )
        .select("doc", word_ngram_hashes("__t", n).alias("shingles"))
        .filter(F.size("shingles") > 0)
    )
    sizes = sh.select("doc", F.size("shingles").alias("sz"))
    exploded = sh.select("doc", F.explode("shingles").alias("s"))
    if max_candidate_pairs is not None:
        # Tier 1 — O(docs) pre-check, no explode and no posting shuffle:
        # with n docs and P = Σ_d |shingles_d| total postings, every
        # per-shingle frequency satisfies f ≤ n (shingles are distinct
        # within a doc), so Σ_s f·(f−1)/2 ≤ P·(n−1)/2. When that bound
        # already clears the cap, the exact estimator (an explode +
        # groupBy shuffle over every posting) is provably unnecessary
        # and is skipped — the common small-corpus default call pays one
        # cheap map-side agg instead of shingling the corpus twice.
        pre = sizes.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("sz"), F.lit(0)).alias("p"),
        ).collect()[0]
        if pre["p"] * max(pre["n"] - 1, 0) / 2 <= max_candidate_pairs:
            max_candidate_pairs = None
        else:
            # Tier 2 — the exact estimator must run. Persist the
            # shingled frame so the estimate job and the executed plan
            # share ONE tokenize+hash scan of the corpus (otherwise the
            # guard's eager job re-shingles everything the real plan
            # shingles again); released with the caller's session
            # lifecycle like the other multi-consumer dedup
            # intermediates, or explicitly via ``cache_registry`` +
            # ``release_caches``.
            sh = sh.persist()
            if cache_registry is not None:
                cache_registry.append(sh)
    if max_shingle_freq is not None or max_candidate_pairs is not None:
        freq = exploded.groupBy("s").agg(F.count(F.lit(1)).alias("f"))
        if max_shingle_freq is not None:
            freq = freq.filter(F.col("f") <= max_shingle_freq)
            exploded = exploded.join(freq.select("s"), "s")
        if max_candidate_pairs is not None:
            est = freq.agg(
                F.coalesce(
                    F.sum(F.col("f") * (F.col("f") - 1) / 2), F.lit(0.0)
                ).alias("p")
            ).collect()[0]["p"]
            if est > max_candidate_pairs:
                # the refused plan is never executed — release the
                # shingle frame the estimator materialized rather than
                # leaving it pinned in executor storage
                sh.unpersist(blocking=False)
                raise ValueError(
                    f"ngram_jaccard_pairs: the inverted-index self-join would "
                    f"generate ~{int(est):,} candidate rows "
                    f"(Σ f·(f−1)/2 over shingle frequencies), above "
                    f"max_candidate_pairs={max_candidate_pairs:,}. This corpus "
                    f"is in the dense regime where the exact pairwise metric "
                    f"is quadratic by its output lower bound. Either tighten "
                    f"max_shingle_freq (currently {max_shingle_freq!r}) to cut "
                    f"stop-shingles, use minhash_lsh_dedup (candidates-first, "
                    f"bounded by LSH band collisions), or pass "
                    f"max_candidate_pairs=None to run the quadratic knowingly."
                )
    a = exploded.alias("a")
    # Catalyst's size estimate for an exploded index is the PRE-explode
    # file bytes, so it happily broadcasts a many-million-row build
    # side — every task then materializes the whole index as its hash
    # table (measured: 32 × ~400 MB duplicated builds at sf1; at real
    # scale that is an executor OOM, not a slowdown). Pin the self-join
    # to a shuffled hash join: both sides partition by the shingle and
    # each task builds only its slice.
    b = exploded.hint("shuffle_hash").alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("common"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _portable_hash(i: Column | int, s: Column) -> Column:
    """Deterministic 60-bit hash reproducible in any engine:
    first 15 hex chars of md5(seed | value), parsed base-16."""
    seed = F.lit(str(i)) if isinstance(i, int) else i.cast("string")
    return F.conv(
        F.substring(F.md5(F.encode(F.concat_ws("|", seed, s), "UTF-8")), 1, 15), 16, 10
    ).cast("long")


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
    portable: bool = True,
) -> DataFrame:
    """Per-document MinHash signature: for hash function i, the minimum
    hash over the document's shingle set. ``portable=True`` uses the
    md5-derived hash (cross-engine verifiable); False uses xxhash64
    (≈10× faster, JVM intrinsic) for production runs.

    Output: (id, sig array<long> of length num_hashes). Shape: explode
    shingles once, then ``num_hashes`` simple min-aggregates grouped by
    doc — every hash is a codegen-able scalar expression evaluated on
    an already-materialized shingle row (a nested array_min-of-
    transform spelling re-evaluates the shingle array per hash in
    interpreted HOF mode — ~num_hashes× slower), and the one shuffle
    is map-side combined down to a row per doc.
    """
    # portable shingles stay strings (the md5 path is the cross-engine
    # oracle); the production path shingles straight to 64-bit hashes
    # (word_ngram_hashes) so the num_hashes per-row hash computations
    # chew 8-byte longs, not gram strings
    shingle = word_ngrams if portable else word_ngram_hashes
    ex = _ensure_parallelism(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
    ).select("doc", F.explode(shingle("__t", n)).alias("s"))
    if portable:
        aggs = [
            F.min(_portable_hash(i, F.col("s"))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    else:
        aggs = [
            F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    return (
        ex.groupBy("doc")
        .agg(*aggs)
        .select(
            "doc", F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig")
        )
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    portable: bool = False,
    cache: bool = True,
    eager_cache: bool = True,
    max_bucket_size: int | None = None,
    max_candidate_pairs: int | None = 100_000_000,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """LSH candidate pairs: split the signature into ``bands`` bands of
    ``num_hashes/bands`` rows; documents sharing any band hash are
    candidates. One shuffle on (band_index, band_hash). A pair sharing
    k bands appears k times in the self-join; on the default path each
    pair is kept only at its FIRST colliding band — a pure codegen
    filter over the per-doc band-bucket array both join rows carry, so
    no global ``.distinct()`` shuffle of the join output (same
    technique as ``simhash_near_dup_pairs``, proven there in r12). The
    filter compares the exact bucket values the join matched on, so
    emission is exactly-once by construction, hash collisions
    included.

    The band self-join generates f·(f−1)/2 join rows per (band, bucket)
    with f docs, so a boilerplate-heavy corpus — thousands of docs with
    identical signatures in some band — goes near-quadratic in that hot
    bucket. Same two-tier protection as ``simhash_near_dup_pairs``:

    ``max_bucket_size`` drops (band, bucket) groups larger than the cap
    before the join. Recall tradeoff, documented: a pair whose ONLY
    colliding band sits in a dropped bucket is lost — but a bucket that
    hot means those docs are boilerplate-identical in that band, the
    regime where ``exact_dedup`` should run first anyway. Under the cap
    a pair whose first colliding band was dropped must still surface
    via a later surviving band, so the capped path keeps the
    ``.distinct()``.

    ``max_candidate_pairs`` is the default-on refusal rail: tier 1 is
    an O(1)-job pre-check — with n docs every bucket satisfies f ≤ n,
    so join rows ≤ bands·n·(n−1)/2; when that loose bound clears the
    cap the estimator never runs (the common small-corpus call pays at
    most one count). Tier 2 computes the exact bound Σ f·(f−1)/2 over
    post-cap bucket sizes and refuses with every escape hatch named
    when it exceeds the cap; the banded frame feeding the estimator is
    recomputed from the signature cache when ``cache=True`` (cheap:
    posexplode + ``bands`` band hashes per doc) and persisted
    otherwise. The
    default cap is 100M for the same reason as SimHash's: a true
    near-dup pair costs up to ``bands``× its count in join rows.

    Persisted intermediates are appended to ``cache_registry`` when
    given; a long-lived session should pass a list and unpersist its
    entries after the final action on the returned frame (see
    ``release_caches``) — otherwise the signature cache stays pinned in
    executor storage until the session ends."""
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    if rows < 1:
        raise ValueError(
            f"num_hashes={num_hashes} with bands={bands} leaves zero signature "
            f"rows per band — every document would share every (empty) band "
            f"bucket and the self-join would be all-pairs."
        )
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, n, portable)
    n_docs: int | None = None
    if cache:
        # both sides of the self-join read the same banded frame; the
        # signature aggregation doesn't canonicalize to a reused
        # exchange (one side becomes a broadcast), so cache it instead
        # of computing signatures twice
        sigs = sigs.persist()
        if cache_registry is not None:
            cache_registry.append(sigs)
        if eager_cache:
            # materialize before the self-join: with a lazy persist,
            # both join sides can race cache population and each
            # recompute the full shingle+minhash pipeline on first run
            # (3-5x run-to-run swings). The eager pass costs one extra
            # read of the pipeline but makes first-run latency
            # predictable; benchmarks that amortize over best-of-N may
            # pass eager_cache=False to skip it. The count doubles as
            # the guard's tier-1 doc count (tighter than df.count():
            # docs with no shingles produce no banded rows).
            n_docs = sigs.count()
    # The per-doc band-bucket array rides the banded frame so the
    # first-collide filter can compare ALL bands' buckets on a join
    # row. Buckets are 8-byte LONGS, not md5 hex strings: the carried
    # array and the join key both shuffle on every banded row, and the
    # hex-string spelling measured ~15% SLOWER than the old
    # distinct-based code on the natural sf1 corpus (260 pairs) purely
    # from shuffling ~200 B of strings per row — the compact spelling
    # keeps the banded row at roughly the old width, so the carry is
    # free and the removed distinct shuffle is pure win on
    # collision-heavy corpora. Fast path: xxhash64 straight over the
    # band's slice of sig longs, no string materialization. Portable
    # path: the engine's 60-bit md5-prefix hash of the comma-joined
    # slice (same _portable_hash family as the signatures; since r15
    # the DuckDB oracle computes this exact 60-bit bucket too, so the
    # candidate sets are key-identical across engines).
    if portable:
        def _bucket_at(b: int) -> Column:
            joined_slice = F.concat_ws(
                ",", *[F.col("sig")[b * rows + i].cast("string") for i in range(rows)]
            )
            return _portable_hash(b, joined_slice)
    else:
        def _bucket_at(b: int) -> Column:
            return F.xxhash64(
                F.lit(b), *[F.col("sig")[b * rows + i] for i in range(rows)]
            )
    banded = sigs.select(
        "doc", F.array(*[_bucket_at(b) for b in range(bands)]).alias("bks")
    ).select("doc", "bks", F.posexplode("bks").alias("band", "bucket"))
    pinned: DataFrame | None = None
    if max_candidate_pairs is not None:
        if n_docs is None:
            n_docs = df.count()
        if bands * n_docs * max(n_docs - 1, 0) / 2 <= max_candidate_pairs:
            max_candidate_pairs = None
        elif not cache:
            # estimator + executed plan must share one signature
            # computation; with cache=True the sigs cache already
            # provides that and re-deriving banded from it is cheap
            banded = pinned = banded.persist()
            if cache_registry is not None:
                cache_registry.append(banded)
    if max_bucket_size is not None or max_candidate_pairs is not None:
        freq = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("f"))
        if max_bucket_size is not None:
            freq = freq.filter(F.col("f") <= max_bucket_size)
            banded = banded.join(freq.select("band", "bucket"), ["band", "bucket"])
        if max_candidate_pairs is not None:
            est = freq.agg(
                F.coalesce(
                    F.sum(F.col("f") * (F.col("f") - 1) / 2), F.lit(0.0)
                ).alias("p")
            ).collect()[0]["p"]
            if est > max_candidate_pairs:
                # release every frame this call pinned: the raise means
                # the caller never gets a handle to act on (the
                # cache_registry contract covers the success path)
                if pinned is not None:
                    pinned.unpersist(blocking=False)
                if cache:
                    sigs.unpersist(blocking=False)
                raise ValueError(
                    f"minhash_lsh_pairs: the band self-join would generate "
                    f"~{int(est):,} join rows (Σ f·(f−1)/2 over (band, bucket) "
                    f"sizes), above max_candidate_pairs={max_candidate_pairs:,}. "
                    f"A bucket this hot means many documents share identical "
                    f"MinHash signatures in some band — boilerplate mass. Either "
                    f"set max_bucket_size (currently {max_bucket_size!r}) to "
                    f"drop hot buckets (documented recall tradeoff), run "
                    f"exact_dedup first to collapse the boilerplate mass, or "
                    f"pass max_candidate_pairs=None to run the quadratic "
                    f"knowingly."
                )
    a, b = banded.alias("a"), banded.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc") < F.col("b.doc")),
    )
    if max_bucket_size is None:
        # Keep each pair only at its first colliding band: the join
        # matched a.bucket == b.bucket at this row's band, and the two
        # bks arrays hold the SAME bucket hashes the other bands' join
        # rows matched on, so `a.band == min{j: a.bks[j] == b.bks[j]}`
        # selects exactly one of a pair's k join rows — set-identical
        # to the old global `.distinct()` with no wide shuffle of the
        # join output. Only valid when no bucket was dropped — under
        # max_bucket_size a pair whose first colliding band sat in a
        # dropped bucket must still surface via a later surviving band,
        # so the capped path below keeps the distinct.
        first_collide = F.lit(bands - 1)
        for j in range(bands - 2, -1, -1):
            first_collide = F.when(
                F.col("a.bks")[j] == F.col("b.bks")[j], F.lit(j)
            ).otherwise(first_collide)
        return joined.filter(F.col("a.band") == first_collide).select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
    return joined.select(
        F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
    ).distinct()


def minhash_lsh_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    verify_threshold: float | None = 0.8,
    portable: bool = False,
    transitive: bool = False,
    eager_cache: bool = True,
    max_bucket_size: int | None = None,
    max_candidate_pairs: int | None = 100_000_000,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Near-dup removal: LSH candidates (optionally verified with true
    Jaccard ≥ threshold), then keep one representative per duplicate
    group.

    Default policy (``transitive=False``): drop the larger id of every
    verified pair (min-neighbor) — single-pass, the standard
    large-scale shortcut; a doc that reaches the group's minimum only
    through intermediaries can survive. ``transitive=True`` collapses
    the verified-pair graph to connected components first
    (operators/graph.py), keeping exactly the minimum id of each
    component — cluster-level semantics at the cost of O(diameter)
    label-propagation rounds over the (tiny) candidate graph.

    ``max_bucket_size`` / ``max_candidate_pairs`` pass through to
    ``minhash_lsh_pairs`` (hot-bucket drop + two-tier quadratic-join
    refusal rail — see there for semantics and recall tradeoffs).

    Pass ``cache_registry`` (a list) to receive every persisted
    intermediate; call ``release_caches`` on it after the final action
    on the returned frame so a long-lived session doesn't accumulate
    pinned signature/pair caches. Note ``verify_threshold`` registers
    TWO extra caches (the candidate pairs and the candidate-shingle
    frame — the latter feeds both verify joins, which alias-blind
    exchange reuse would otherwise recompute); without a registry both
    stay pinned until session teardown, deduped across repeat calls by
    Spark's CacheManager like the signature cache (ADVICE r15)."""
    pairs = minhash_lsh_pairs(
        df, id_col, text_col, num_hashes, bands, n, portable,
        eager_cache=eager_cache, max_bucket_size=max_bucket_size,
        max_candidate_pairs=max_candidate_pairs,
        cache_registry=cache_registry,
    )
    if verify_threshold is not None:
        # Verify ONLY the LSH candidates, and shingle ONLY the docs that
        # appear in a candidate pair (semi-join first): verification
        # cost is O(candidates), never another pass over the corpus —
        # at scale the candidate set is tiny relative to the input.
        # `pairs` feeds three consumers (both verify joins + the id
        # set), so persist it rather than recomputing the band join.
        pairs = pairs.persist()
        if cache_registry is not None:
            cache_registry.append(pairs)
        cand_ids = (
            pairs.select(F.col("doc_a").alias("doc"))
            .union(pairs.select(F.col("doc_b").alias("doc")))
            .distinct()
        )
        # true-Jaccard verification only needs shingle EQUALITY; the
        # fast path intersects 64-bit hash arrays instead of strings
        shingle = word_ngrams if portable else word_ngram_hashes
        sh = (
            df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))
            .join(F.broadcast(cand_ids), "doc", "left_semi")
            .repartition(df.sparkSession.sparkContext.defaultParallelism, "doc")
            .select("doc", shingle("__t", n).alias("s"))
            # both verify joins consume this frame under DIFFERENT
            # aliases (doc_a/doc_b), which blocks exchange reuse — the
            # unpersisted spelling ran the corpus scan + candidate
            # semi-join + shingling twice per action (verified in the
            # r15 before-plan: two independent BroadcastExchange
            # subtrees over the same scan). Persist + eager count: one
            # scan populates the cache, both broadcast builds read it
            # (lazy persist would let the two builds race population,
            # the same race minhash_lsh_pairs eager-caches sigs for).
            .persist()
        )
        if cache_registry is not None:
            cache_registry.append(sh)
        sh.count()
        verified = (
            pairs.join(
                sh.select(F.col("doc").alias("doc_a"), F.col("s").alias("sa")), "doc_a"
            )
            .join(
                sh.select(F.col("doc").alias("doc_b"), F.col("s").alias("sb")), "doc_b"
            )
            .withColumn("__common", F.size(F.array_intersect("sa", "sb")))
            .withColumn(
                "__j",
                F.col("__common").cast("double")
                / (F.size("sa") + F.size("sb") - F.col("__common")).cast("double"),
            )
            .filter(F.col("__j") >= verify_threshold)
        )
        pairs = verified.select("doc_a", "doc_b")
    if transitive:
        from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.graph import (
            dedup_by_components,
        )

        return dedup_by_components(df, pairs, id_col)
    losers = pairs.select(F.col("doc_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def simhash_table(
    df: DataFrame, id_col: str, text_col: str = "text", portable: bool = False
) -> DataFrame:
    """SimHash per document: explode tokens, hash each, and per bit
    take the sign of the sum of ±1 contributions. One shuffle on the
    doc id with per-bit vectorized sums — far cheaper per row than
    nested array folds, and the shuffle key is the same id downstream
    ops group on.

    Default: 64-bit xxhash64 (JVM intrinsic, the production path).
    ``portable=True``: 60-bit md5-derived hash reproducible in any
    engine (the oracle-checkable path, same trick as MinHash's)."""
    nbits = 60 if portable else 64
    ex = _ensure_parallelism(
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t")), "doc"
    ).select("doc", F.explode(tokens("__t")).alias("tok"))
    if portable:
        ex = ex.withColumn("h", _portable_hash(0, F.col("tok")))
    else:
        ex = ex.withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(nbits)
    ]
    sums = ex.groupBy("doc").agg(*aggs)
    acc: Column = F.lit(0).cast("long")
    for i in range(nbits):
        bitval = (1 << i) if i < 63 else -(1 << 63)
        acc = acc.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.lit(bitval).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sums.select("doc", acc.alias("h"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    bands: int = 4,
    portable: bool = False,
    max_bucket_size: int | None = None,
    max_candidate_pairs: int | None = 100_000_000,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Candidate near-dup pairs by SimHash band collision: split the
    hash bits into ``bands`` equal bands; docs equal in any band are
    candidates (any pair at Hamming distance < bands is guaranteed to
    collide in some band).

    The band self-join generates f·(f−1)/2 join rows per (band, bucket)
    with f docs, so a boilerplate-heavy corpus — thousands of docs whose
    simhash agrees in some band — goes near-quadratic in that hot
    bucket. Same protection family as ``ngram_jaccard_pairs``
    (VERDICT r11 ask #4):

    ``max_bucket_size`` drops (band, bucket) groups larger than the
    cap before the join. Recall tradeoff, documented: a pair whose ONLY
    colliding band sits in a dropped bucket is lost — but a bucket that
    hot means those docs are boilerplate-identical in that band, the
    regime where exact dedup or MinHash-LSH (whose verify step is
    candidates-first) is the right tool anyway.

    ``max_candidate_pairs`` is the default-on refusal rail, two-tiered
    like the ngram guard: tier 1 is an O(1)-job pre-check — with n docs
    every bucket satisfies f ≤ n, so join rows ≤ bands·n·(n−1)/2; when
    that loose bound clears the cap the estimator never runs (the
    common small-corpus call pays one count, no simhash recompute).
    Tier 2 persists the banded frame (estimator and executed plan share
    one simhash computation; pass ``cache_registry`` + call
    ``release_caches`` after the final action, as with the ngram guard)
    and computes the exact bound Σ f·(f−1)/2 over post-cap bucket
    sizes, refusing with every escape hatch named when it exceeds the
    cap. The default is 100M, not the ngram family's 50M: a true
    near-dup pair collides in up to ``bands`` bands in the self-join,
    so a boilerplate-identical cluster costs ``bands``× its pair count
    in join rows (the per-pair multiplicity is then shed by the
    first-colliding-band filter on the default path; a dedup
    ``distinct`` survives only on the ``max_bucket_size``-capped
    path). Measured on the natural word-shuffle
    corpus (r12): sf1 (50k docs) est 14.49M join rows → 13.65M
    distinct pairs (avg ~1.06 colliding bands); sf2 (100k docs) est
    58.18M → 54.66M pairs, a legitimate answer 16 cores return in
    ~105 s, which a 50M cap would refuse. Bucket count holds at ~6k
    while occupancy doubles, so est grows ~4× per doubling — the
    default refuses this corpus shape from ~130k docs up, exactly the
    regime where the answer itself goes quadratic."""
    nbits = 60 if portable else 64
    if bands < 1:
        raise ValueError(f"bands must be >= 1, got {bands}")
    width = nbits // bands
    if width < 1:
        # bands > nbits makes every band slice zero bits wide: every
        # document shares every (empty) band and the self-join is
        # all-pairs with a vacuous first-collide filter. Fail fast.
        raise ValueError(
            f"bands={bands} exceeds the {nbits}-bit hash width — each band "
            f"must cover at least one bit (bands <= {nbits})."
        )
    sh = simhash_table(df, id_col, text_col, portable=portable)
    banded = sh.select(
        "doc",
        "h",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("h"), b * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    pinned: DataFrame | None = None
    if max_candidate_pairs is not None:
        n = df.count()
        if bands * n * max(n - 1, 0) / 2 <= max_candidate_pairs:
            max_candidate_pairs = None
        else:
            banded = pinned = banded.persist()
            if cache_registry is not None:
                cache_registry.append(banded)
    if max_bucket_size is not None or max_candidate_pairs is not None:
        freq = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("f"))
        if max_bucket_size is not None:
            freq = freq.filter(F.col("f") <= max_bucket_size)
            banded = banded.join(freq.select("band", "bucket"), ["band", "bucket"])
        if max_candidate_pairs is not None:
            est = freq.agg(
                F.coalesce(
                    F.sum(F.col("f") * (F.col("f") - 1) / 2), F.lit(0.0)
                ).alias("p")
            ).collect()[0]["p"]
            if est > max_candidate_pairs:
                # unpersist the PINNED frame, not the current binding —
                # the max_bucket_size filter may have rebound `banded`
                # to an unpersisted derivative
                if pinned is not None:
                    pinned.unpersist(blocking=False)
                raise ValueError(
                    f"simhash_near_dup_pairs: the band self-join would generate "
                    f"~{int(est):,} join rows (Σ f·(f−1)/2 over (band, bucket) "
                    f"sizes), above max_candidate_pairs={max_candidate_pairs:,}. "
                    f"A bucket this hot means many documents are "
                    f"boilerplate-identical in some band. Either set "
                    f"max_bucket_size (currently {max_bucket_size!r}) to drop "
                    f"hot buckets (documented recall tradeoff), run exact dedup "
                    f"or minhash_lsh_dedup first to collapse the boilerplate "
                    f"mass, or pass max_candidate_pairs=None to run the "
                    f"quadratic knowingly."
                )
    a, b = banded.alias("a"), banded.alias("b")
    joined = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.doc") < F.col("b.doc")),
    )
    if max_bucket_size is None:
        # A pair colliding in k bands appears k times in the join; the
        # naive dedup is a global `.distinct()` — a WIDE SHUFFLE of
        # every join row (est 58M at sf2's natural corpus). Both full
        # hashes ride the banded frame, so instead keep each pair only
        # at its FIRST colliding band: a pure bitwise codegen filter
        # inside the join stage emits every pair exactly once and the
        # dedup shuffle disappears. Only valid when no bucket was
        # dropped — under max_bucket_size a pair whose first colliding
        # band sits in a dropped bucket must still surface via a later
        # surviving band, so the capped path keeps the distinct.
        def _band_at(h, j: int):
            return F.shiftright(h, j * width).bitwiseAND(F.lit((1 << width) - 1))

        first_collide = F.lit(bands - 1)
        for j in range(bands - 2, -1, -1):
            first_collide = F.when(
                _band_at(F.col("a.h"), j) == _band_at(F.col("b.h"), j), F.lit(j)
            ).otherwise(first_collide)
        return joined.filter(F.col("a.band") == first_collide).select(
            F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
        )
    return joined.select(
        F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b")
    ).distinct()


def dot_exact(x: Column, y: Column) -> Column:
    """Exact-decimal dot product: per-element products are IEEE doubles
    (deterministic), summed as DECIMAL(30,12) (order-independent), so
    the result is bit-identical across engines and partitionings."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: (p.cast("double") * q.cast("double")).cast(_DEC12)),
        F.lit(0).cast(_DEC12),
        lambda acc, v: (acc + v).cast(_DEC12),
    ).cast("double")


def dot_exact_sql(x: str, y: str) -> str:
    """SQL spelling of ``dot_exact`` over two array-SQL fragments —
    the single-expr fast path (one py4j round trip instead of one per
    tree node, see text.py's fast-path rationale; the dot_exact tree
    costs ~50 ms to build through the functions API and similarity
    queries build three of them per call). Semantics are IDENTICAL to
    the Column spelling: same casts, same DECIMAL(30,12) accumulator,
    so every value is bit-identical (pinned by
    test_dot_exact_sql_parity)."""
    prod = "CAST(CAST(p AS DOUBLE) * CAST(q AS DOUBLE) AS DECIMAL(30,12))"
    step = "CAST(acc + v AS DECIMAL(30,12))"
    return (
        f"CAST(aggregate(zip_with({x}, {y}, (p, q) -> {prod}), "
        f"CAST(0 AS DECIMAL(30,12)), (acc, v) -> {step}) AS DOUBLE)"
    )


def cosine_sim_exact_sql(a: str, b: str) -> str:
    """SQL spelling of ``cosine_sim_exact`` over two array-SQL
    fragments — same values, one expression-build round trip."""
    return (
        f"{dot_exact_sql(a, b)} / "
        f"(sqrt({dot_exact_sql(a, a)}) * sqrt({dot_exact_sql(b, b)}))"
    )


def cosine_sim_exact(a: Column, b: Column) -> Column:
    """Cosine similarity built on ``dot_exact`` — bit-identical across
    engines and partitionings."""
    return dot_exact(a, b) / (F.sqrt(dot_exact(a, a)) * F.sqrt(dot_exact(b, b)))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_rows: int | None = 100_000,
) -> DataFrame:
    """Embedding near-duplicates: pairs with cosine ≥ threshold.
    Self-norms are computed once per row BEFORE the pair join (one
    exact fold per pair instead of three).

    This is the O(n²) VERIFICATION BASELINE, not the production path —
    ``embedding_near_dup_pairs_bucketed`` is the scale path (bucketed
    equi-join, sum-of-squares instead of full quadratic). To keep the
    quadratic plan from ever reaching a real corpus, the call refuses
    corpora above ``max_rows`` (the size check is one cheap count
    aggregation); pass ``max_rows=None`` to force. The default is
    100k because the cost is ~n²/2 exact-decimal dot products: 20k
    vectors already measure minutes on 32 cores (sf1 sweep), so the
    old 1M default was a guard in name only (5×10¹¹ pairs)."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"embedding_near_dup_pairs is the O(n^2) verification baseline "
                f"and the corpus has {n} rows (> max_rows={max_rows}); use "
                "embedding_near_dup_pairs_bucketed (the production path) or "
                "pass max_rows=None to force."
            )
    vec = F.col(vec_col)
    # the pair join streams one side through a nested-loop broadcast;
    # spread it so the per-pair cosine work runs on every core
    normed = _ensure_parallelism(df, id_col).select(
        F.col(id_col).alias("id"), vec.alias("v"), dot_exact(vec, vec).alias("nn")
    )
    a = normed.select(
        F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("nn").alias("na")
    )
    b = normed.select(
        F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("nn").alias("nb")
    )

    # Two-phase: a cheap all-double cosine prunes the quadratic pair set
    # (with a 1e-6 safety margin — double vs decimal accumulation agree
    # far tighter than that), then the exact-decimal metric is computed
    # only for survivors, keeping the reported values and the threshold
    # decision bit-identical to the oracle.
    fast = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    ) / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("__fast", fast)
        .filter(F.col("__fast") >= threshold - 1e-6)
        .withColumn(
            "cosine",
            dot_exact(F.col("va"), F.col("vb"))
            / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def embedding_near_dup_pairs_bucketed(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_buckets: int = 16,
    probe: int = 1,
    refine_rounds: int = 0,
    eager_cache: bool = False,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: assign each vector to its
    nearest coarse centroid (narrow map over a broadcast centroid set)
    and run the pair join WITHIN buckets only — the quadratic term
    becomes sum of per-bucket squares, ~1/num_buckets of the full
    cross join for balanced buckets. Near-identical vectors (the
    near-dup regime) quantize to the same centroid, so recall at high
    thresholds is near-1. ``probe`` > 1 assigns each vector to its
    ``probe`` nearest centroids (explode), recovering cross-bucket
    borderline pairs at ~probe² join cost (pairs sharing several
    buckets are deduplicated before the exact-decimal cosine).
    ``refine_rounds`` runs that many Lloyd rounds on the seed
    centroids at index-build time (similarity.refine_centroids)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.similarity import (
        assign_clusters,
        build_ivf_index,
    )

    spread = _ensure_parallelism(df, id_col)
    assigned, cents = build_ivf_index(
        spread, num_buckets, id_col, vec_col, refine_rounds=refine_rounds
    )
    vec = F.col(vec_col)
    if probe > 1:
        assigned = assign_clusters(spread, cents, vec_col, probe=probe)
    # both sides of the within-bucket self-join consume this frame; the
    # centroid assignment (C x D distance per row) is the expensive
    # narrow work, so persist one materialization instead of computing
    # it twice (the self-join does not canonicalize to a reused
    # exchange). The exact-decimal self-norm does NOT ride here (r15):
    # it is an interpreted DECIMAL(30,12) fold per CORPUS row, yet only
    # the survivor pairs — a vanishing fraction — ever need exactness.
    # The GEMM prefilter derives float64 norms from the batch itself
    # (difference vs the exact norm is ~1e-15 relative, absorbed by the
    # prefilter's existing 1e-6 margin contract), and the exact norms
    # are recomputed inside the final exact-cosine expression for
    # survivors only — same dot_exact folds, so the reported values and
    # the threshold decision are bit-identical.
    normed = assigned.select(
        F.col(id_col).alias("id"),
        vec.alias("v"),
        F.col("__cluster").alias("b"),
    ).persist()
    if cache_registry is not None:
        cache_registry.append(normed)
    if eager_cache:
        # opt-in materialization before the pair stage. Measured at
        # sf0.1: this path's cold-run spikes are whole-stage-codegen
        # JIT of the exact-decimal array expressions, NOT the cache
        # race the MinHash pipeline had (eager added ~20% steady-state
        # for no first-run improvement), so lazy is the default here —
        # unlike minhash_lsh_pairs, where eager is the default.
        normed.count()

    # Candidate generation: one Arrow batch per bucket, numpy GEMM for
    # the all-pairs-within-bucket fast cosine. The sf0.1→sf1 scale
    # decade (SCALE.md) showed the previous spelling — a (bucket,
    # id_a<id_b) self-JOIN whose per-pair dot ran through Catalyst
    # higher-order functions — was linear in pair count but paid ~6 µs
    # per pair interpreting the lambda, plus a wide dropDuplicates
    # shuffle carrying BOTH vectors for every candidate. Per-bucket
    # float64 matmul does the same ~(n/B)²·B·probe² pair dots at BLAS
    # speed and emits ONLY ids of pairs above the margin-relaxed
    # threshold, so the dedup shuffle is id-pairs, not vectors. The
    # group batch is one bucket (~bucket_target vectors × dim floats —
    # bounded because num_buckets scales with the corpus), so executor
    # memory stays flat at 100 TB. The reported cosine and the
    # threshold DECISION remain the exact-decimal fold below — numpy is
    # only ever a prefilter with a 1e-6 margin, same contract the HOF
    # prefilter had.
    import numpy as np
    import pandas as pd

    id_ddl = df.schema[id_col].dataType.simpleString()
    margin = threshold - 1e-6

    def _bucket_fast_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": ids[:0], "id_b": ids[:0]})
        mat = np.stack(pdf["v"].to_numpy()).astype(np.float64, copy=False)
        inv = 1.0 / np.sqrt((mat * mat).sum(axis=1))
        unit = mat * inv[:, None]
        gram = unit @ unit.T
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = gram[iu, ju] >= margin
        x, y = ids[iu[hit]], ids[ju[hit]]
        return pd.DataFrame(
            {"id_a": np.minimum(x, y), "id_b": np.maximum(x, y)}
        )

    cand = normed.groupBy("b").applyInPandas(
        _bucket_fast_pairs, f"id_a {id_ddl}, id_b {id_ddl}"
    )
    if probe > 1:
        # a pair sharing several probed buckets surfaces once per
        # shared bucket — collapse before the exact-decimal cosine
        # (id-only rows by now, so this shuffle is bytes per pair)
        cand = cand.dropDuplicates(["id_a", "id_b"])
    # survivors of the fast prefilter are the near-dup regime — a
    # vanishing fraction — so fetching vectors back for the exact
    # fold is two joins on a tiny left side; the exact-decimal self
    # norms run HERE, once per survivor row, never per corpus row
    vecs = normed.dropDuplicates(["id"]).select("id", "v")
    a = vecs.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    bb = vecs.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(a, "id_a")
        .join(bb, "id_b")
        .withColumn(
            "cosine",
            dot_exact(F.col("va"), F.col("vb"))
            / (
                F.sqrt(dot_exact(F.col("va"), F.col("va")))
                * F.sqrt(dot_exact(F.col("vb"), F.col("vb")))
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_buckets: int = 16,
    probe: int = 2,
    refine_rounds: int = 1,
    transitive: bool = False,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Semantic deduplication over an embedding column — the SemDedup
    recipe (Abbas et al. 2023, public): cluster the embedding space
    with coarse k-means, treat within-cluster pairs with cosine ≥
    ``threshold`` as semantic duplicates, and keep one representative
    per duplicate group. Returns the SURVIVOR rows of ``df`` (all
    columns).

    Pair generation is ``embedding_near_dup_pairs_bucketed`` — the
    bucketed equi-join scale path (quadratic only within buckets, and
    bucket count scales with the corpus so per-bucket work is bounded;
    multi-probe recovers borderline cross-bucket pairs). Near-identical
    embeddings quantize to the same centroid, so recall at the high
    thresholds semantic dedup runs at (0.9+) is near-1.

    Representative policy: default (``transitive=False``) drops the
    larger id of every duplicate pair — single-pass, same greedy
    shortcut as the MinHash family, so a row that reaches the group
    minimum only through intermediaries can still be dropped while its
    bridge survives. ``transitive=True`` collapses the pair graph to
    connected components (operators/graph.py) and keeps exactly the
    minimum id of each component. Deterministic either way."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.graph import (
        dedup_by_components,
    )

    pairs = embedding_near_dup_pairs_bucketed(
        df,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        num_buckets=num_buckets,
        probe=probe,
        refine_rounds=refine_rounds,
        cache_registry=cache_registry,
    )
    if transitive:
        return dedup_by_components(df, pairs, id_col, "id_a", "id_b")
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


def cross_ngram_contamination(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    stop_shingle_cap: int = 1000,
    broadcast_eval_shingles: int = 4_000_000,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Benchmark-contamination check: for every eval document, the
    largest shingle-overlap fraction against any training document
    (|common distinct n-gram shingles| / |eval shingles|) plus the
    offending train doc id. The canonical pre-training hygiene step —
    an eval doc whose content leaked into the training corpus shows up
    with overlap near 1.

    Shape: inverted-index join on the shingle (the n-gram Jaccard
    machinery pointed across two corpora instead of at itself) — never
    an all-pairs join. The asymmetry is the whole design: the train
    corpus is the 100 TB side, the eval side is benchmark suites —
    typically thousands of docs. When the distinct eval shingle set is
    at most ``broadcast_eval_shingles`` (8-byte hashed keys, so 4M ≈
    32 MB), it is broadcast and the train corpus is filtered map-side:
    the full train shingle inventory is NEVER shuffled — only postings
    that hit an eval shingle (a vanishing fraction) reach a reducer.
    Above the threshold it degrades to the symmetric shuffle join.
    Shingles occurring in more than ``stop_shingle_cap`` training docs
    are excluded on BOTH sides (boilerplate n-grams would otherwise
    give one reducer a quadratic bucket and inflate overlap with
    meaningless matches); their doc frequency is counted on the
    eval-filtered postings, which preserves each surviving shingle's
    exact full-corpus df."""
    # shingles are 64-bit hashes end-to-end (word_ngram_hashes): no
    # per-gram string allocation in the interpreted HOF lambda (~3x
    # cheaper shingling), and the join / doc-frequency / semi-join keys
    # are 8-byte longs instead of ~n-word strings (~4-8x less shuffle
    # IO at corpus scale). Overlap counts are unaffected short of an
    # xxhash64 collision *within one (eval, train) doc pair's* shingle
    # set — negligible at any corpus size that fits a cluster.
    tr = _ensure_parallelism(
        train.select(F.col(id_col).alias("train_id"), F.col(text_col).alias("__t")),
        "train_id",
    ).select("train_id", word_ngram_hashes("__t", n).alias("s")).filter(
        F.col("s").isNotNull()
    )
    # the eval shingle arrays feed three consumers (the broadcast set,
    # the inverted-index join, the per-doc sizes); persist so the eval
    # corpus is shingled once. Small by contract — it's the benchmark
    # suite side. Without a cache_registry the entry outlives the
    # query, but Spark's CacheManager dedupes identical plans, so
    # repeated runs of the same query reuse ONE bounded entry (and
    # LRU-evict under pressure) rather than accumulating; long-lived
    # sessions that vary inputs should pass cache_registry and
    # release_caches.
    ev = _ensure_parallelism(
        eval_df.select(F.col(id_col).alias("eval_id"), F.col(text_col).alias("__t")),
        "eval_id",
    ).select("eval_id", word_ngram_hashes("__t", n).alias("s")).filter(
        F.col("s").isNotNull()
    ).persist()
    if cache_registry is not None:
        cache_registry.append(ev)
    tr_ex = tr.select("train_id", F.explode("s").alias("g"))
    # Two-tier broadcastability decision (the ngram guard's trick,
    # VERDICT r10 ask #7): distinct eval shingles ≤ total eval postings
    # Σ|shingles_d|, so one map-side agg over the (persisted-anyway)
    # eval frame — no explode, no distinct shuffle — proves the common
    # benchmark-suite call broadcastable without the probe job. Only
    # when the loose bound exceeds the threshold does the exact
    # limit+count probe run to decide broadcast vs shuffle join.
    ev_postings = ev.agg(
        F.coalesce(F.sum(F.size("s")), F.lit(0))
    ).collect()[0][0]
    if ev_postings <= broadcast_eval_shingles:
        # The loose bound holds, so the full eval POSTINGS list (id,
        # size, shingle) is itself broadcast-bound — build it as the
        # round's ONE broadcast relation, keyed on the shingle, and
        # reuse it for every eval-side consumer (r16, guide §2.4/§3.1):
        #   1. the train pre-filter semi-join (map-side inside the
        #      train scan stage — only eval-intersecting postings ever
        #      move, exactly as before; a semi-join probes key
        #      existence, so duplicate g rows behave like the old
        #      distinct-g set),
        #   2. the pair join itself (streams the train postings against
        #      the broadcast — the train side is never collected or
        #      shuffled; the old spelling left the strategy to size
        #      estimates, which locally broadcast the TRAIN side — a
        #      shape that breaks at the 8 GB relation cap at scale),
        #   3. the per-eval shingle count, carried through the pair
        #      aggregation (constant per eval_id) instead of a fourth
        #      broadcast build + join.
        # One broadcast build replaces three (distinct-g, train-side,
        # ev_sizes) plus the distinct shuffle, and both join sites hit
        # the SAME exchange (ReusedExchange in the plan); the eval
        # cache is already materialized, so the build never recomputes
        # shingling.
        ev_b = F.broadcast(
            ev.select(
                "eval_id",
                F.size("s").alias("n_eval_shingles"),
                F.explode("s").alias("g"),
            )
        )
        # Persisted because BOTH the stop-shingle df count and the
        # final join consume it: without the cache the 100 TB train
        # scan + shingling runs twice. What's cached is only the
        # eval-intersecting postings — a vanishing fraction.
        tr_ex = tr_ex.join(ev_b, "g", "left_semi").persist()
        if cache_registry is not None:
            cache_registry.append(tr_ex)
        allowed = (
            tr_ex.groupBy("g")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= stop_shingle_cap)
            .select("g")
        )
        # stop-shingle cap via groupBy + left-semi, NOT a Window — see
        # the shuffle-path comment below for the skew rationale
        tr_allowed = tr_ex.join(F.broadcast(allowed), "g", "left_semi")
        scored = (
            tr_allowed.join(ev_b, "g")
            .groupBy("eval_id", "train_id")
            .agg(
                F.count(F.lit(1)).alias("n_common"),
                # constant within the group (one size per eval doc);
                # min is the deterministic way to carry it through
                F.min("n_eval_shingles").alias("n_eval_shingles"),
            )
            .withColumn(
                "overlap",
                F.col("n_common").cast("double")
                / F.col("n_eval_shingles").cast("double"),
            )
        )
        return _contamination_best(scored)
    ev_ex = ev.select("eval_id", F.explode("s").alias("g"))
    ev_g = ev_ex.select("g").distinct()
    if (
        ev_g.limit(broadcast_eval_shingles + 1).count()
        <= broadcast_eval_shingles
    ):
        # middle tier: postings exceed the threshold but the DISTINCT
        # shingle set fits — broadcast just the key set for the train
        # pre-filter; the pair join stays a shuffle join (both sides
        # big). Persist rationale as above.
        tr_ex = tr_ex.join(F.broadcast(ev_g), "g", "left_semi").persist()
        if cache_registry is not None:
            cache_registry.append(tr_ex)
    # stop-shingle cap via groupBy + left-semi (the ngram_jaccard_pairs
    # shape), NOT a Window over the shingle key: a window puts a hot
    # shingle's ENTIRE postings list ("all rights reserved ...") in one
    # partition before the filter can drop it — exactly the skew the cap
    # exists to prevent. groupBy counts partially aggregate map-side, so
    # no reducer ever holds a hot shingle's full postings; the semi-join
    # then drops banned shingles with a broadcast-able allowed set.
    allowed = (
        tr_ex.groupBy("g")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= stop_shingle_cap)
        .select("g")
    )
    tr_allowed = tr_ex.join(allowed, "g", "left_semi")
    common = (
        ev_ex.join(tr_allowed, "g")
        .groupBy("eval_id", "train_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    ev_sizes = ev.select("eval_id", F.size("s").alias("n_eval_shingles"))
    scored = common.join(ev_sizes, "eval_id").withColumn(
        "overlap",
        F.col("n_common").cast("double") / F.col("n_eval_shingles").cast("double"),
    )
    return _contamination_best(scored)


def _contamination_best(scored: DataFrame) -> DataFrame:
    """Final per-eval argmax over (eval_id, train_id, n_common,
    n_eval_shingles, overlap) candidate rows — shared by both join
    shapes of ``cross_ngram_contamination``."""
    return scored.groupBy("eval_id").agg(
        F.max_by(
            F.struct(
                F.col("overlap"),
                F.col("train_id"),
                F.col("n_common"),
            ),
            # deterministic argmax: highest overlap, ties to LOWEST
            # train id (max_by keeps the max struct; negate the id so
            # struct comparison breaks ties toward the smaller id)
            F.struct(F.col("overlap"), (-F.col("train_id")).alias("neg")),
        ).alias("best"),
    ).select(
        "eval_id",
        F.col("best.overlap").alias("max_overlap"),
        F.col("best.train_id").alias("train_id"),
        F.col("best.n_common").alias("n_common"),
    )
