"""Oracle-checked queries for the training-data operator families:
text analysis, deduplication, similarity search, sampling/curation,
multimodal columns (documents/embeddings tables). Non-SQL-expressible
variants (xxhash64 SimHash, LSH dedup, IVF) register their raw outputs
rows-only, but are still oracle-GATED through invariant queries —
`fastpath_parity_checks` (fast-vs-portable survivor parity, SimHash
band guarantee) and `ivf_recall_check` (recall + bucket balance) —
plus planted-duplicate tests in tests/test_training_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import dedup as D
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import multimodal as M
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import sampling as P
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import similarity as S
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import text as X
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.queries import query, t

# Largest corpus the semantic-dedup query verifies with the O(n²)
# exact (num_buckets=1) pass; larger corpora verify on an
# xxhash64-gated subsample of about this size and return the
# production bucketed survivors. sf0.01/sf0.1 (2,000 vectors) sit
# under the cap, so the DuckDB oracle still sees the exact pass.
_SEMDEDUP_VERIFY_CAP = 4096

# Same guard for the embedding_near_dup_bucketed invariant query's
# brute-force side (the sf1 sweep measured the unguarded comparison at
# 143 s for 20k vectors — quadratic by definition, SCALE.md).
_EMB_BRUTE_VERIFY_CAP = 4096

# DuckDB spelling of the engine's tokenizer (split on whitespace,
# drop empties, lowercase) — kept identical across every oracle below.
_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_DUCK_SHINGLES = (
    "list_distinct(list_transform(range(len(t) - 2), "
    "i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))"
)


@query(
    "token_count_documents",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_DUCK_TOKS}) AS INTEGER) AS n_tokens,
           n_chars
    FROM documents
    """,
)
def token_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting — pure Column expressions, scan-bound."""
    return X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", X.token_count("text").alias("n_tokens"), "n_chars"
    )


@query(
    "text_quality_scores",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS n_chars_obs,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''),
                  tk -> list_contains(['the','and','of','to','a','in','is','it','you','that'], tk))) AS DOUBLE) AS sw
      FROM documents
    )
    SELECT doc_id, n_chars_obs, n_tokens,
           CASE WHEN n_chars_obs > 0 THEN n_punct / n_chars_obs ELSE 0.0 END AS punct_ratio,
           CASE WHEN n_tokens > 0 THEN sw / n_tokens ELSE 0.0 END AS stopword_ratio,
           CASE WHEN n_tokens > 0 THEN (n_chars_obs - (n_tokens - 1)) / n_tokens ELSE 0.0 END AS mean_token_len,
           0.4 * least(n_tokens / 100.0, 1.0)
             + 0.3 * (1.0 - least((CASE WHEN n_chars_obs > 0 THEN n_punct / n_chars_obs ELSE 0.0 END) * 10, 1.0))
             + 0.3 * least((CASE WHEN n_tokens > 0 THEN sw / n_tokens ELSE 0.0 END) * 4, 1.0) AS quality_score
    FROM f
    """,
)
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals + composite score — the filter
    stage of a data-curation pipeline."""
    return X.quality_features(
        X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id")
    ).select(
        "doc_id",
        "n_chars_obs",
        "n_tokens",
        "punct_ratio",
        "stopword_ratio",
        "mean_token_len",
        "quality_score",
    )


def _lang_profile_values() -> str:
    """LANG_PROFILES rendered as SQL VALUES rows — the oracle consumes
    the same literal profile data the Spark classifier broadcasts.
    Trigrams are letters+spaces only (isalpha-filtered), so no
    quoting hazards."""
    return ", ".join(
        f"('{l}', '{tg}', {r})"
        for l in X.LANG_PRIORITY
        for tg, r in X.LANG_PROFILES[l].items()
    )


@query(
    "language_id_documents",
    oracle=f"""
    WITH prof(plang, tg, prank) AS (VALUES {_lang_profile_values()}),
    langs(plang, priority) AS (VALUES ('en', 1), ('de', 2), ('fr', 3), ('es', 4)),
    norm AS (
      SELECT doc_id, lang,
             ' ' || trim(regexp_replace(lower(text), '[^\\p{{L}}]+', ' ', 'g')) || ' ' AS s,
             20 * len(regexp_extract_all(text, '[一-鿿]')) >= length(text)
               AND length(text) > 0 AS is_zh
      FROM documents
    ),
    tgs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, CAST(length(s) - 1 AS BIGINT)),
                                   i -> substr(s, CAST(i AS INTEGER), 3))) AS tg
      FROM norm WHERE length(s) >= 3
    ),
    cnts AS (SELECT doc_id, tg, COUNT(*) AS n FROM tgs GROUP BY doc_id, tg),
    ranked AS (
      SELECT doc_id, tg,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tg ASC) AS rd
      FROM cnts QUALIFY rd <= {X.DOC_TOP_TRIGRAMS}
    ),
    dists AS (
      SELECT r.doc_id, l.plang, l.priority,
             SUM(COALESCE(ABS(r.rd - p.prank), {X.PROFILE_SIZE})) AS dist
      FROM ranked r CROSS JOIN langs l
      LEFT JOIN prof p ON p.plang = l.plang AND p.tg = r.tg
      GROUP BY r.doc_id, l.plang, l.priority
    ),
    best AS (
      SELECT doc_id, plang
      FROM dists
      QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY dist ASC, priority ASC) = 1
    )
    SELECT n.lang,
           CASE WHEN n.is_zh THEN 'zh'
                ELSE COALESCE(b.plang, 'und') END AS lang_pred,
           COUNT(*) AS n_docs
    FROM norm n LEFT JOIN best b ON b.doc_id = n.doc_id
    GROUP BY 1, 2
    """,
)
def language_id_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-tier language ID — CJK script gate, then the Cavnar-Trenkle
    character-trigram rank-profile classifier — summarized as a
    (true lang × predicted lang) confusion table. The oracle replays
    the full out-of-place-distance computation against the same
    profile literals, so every per-document classification decision is
    cross-engine checked, not just the aggregate."""
    docs = X.language_id_trigram(
        X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id")
    )
    return docs.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "fingerprint_documents",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable content fingerprint (md5 over normalized text)."""
    return X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", X.fingerprint_md5("text").alias("fp")
    )


@query(
    "repetition_stats_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), ex AS (
      SELECT doc_id, unnest(t) AS tok FROM toks
    ), c AS (
      SELECT doc_id, tok, COUNT(*) AS n FROM ex GROUP BY doc_id, tok
    ), mode AS (
      SELECT doc_id, SUM(n) AS n_tokens, MAX(n) AS top_n FROM c GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 2 THEN len(t) - 1 ELSE 0 END AS n_bigrams,
             CASE WHEN len(t) >= 2 THEN len(list_distinct(list_transform(
               range(len(t) - 1), i -> t[i+1] || ' ' || t[i+2]))) ELSE 0 END AS n_distinct
      FROM toks
    )
    SELECT m.doc_id,
           CAST(m.n_tokens AS BIGINT) AS n_tokens,
           CAST(m.top_n AS DOUBLE) / CAST(m.n_tokens AS DOUBLE) AS top_token_fraction,
           CASE WHEN b.n_bigrams > 0
                THEN CAST(b.n_bigrams - b.n_distinct AS DOUBLE) / CAST(b.n_bigrams AS DOUBLE)
                ELSE 0.0 END AS dup_bigram_fraction
    FROM mode m JOIN bg b USING (doc_id)
    """,
)
def repetition_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (top-token share,
    duplicate-bigram share) — integer counting end to end, so both
    engines emit bit-identical fractions."""
    return X.repetition_stats(t(spark, sf_dir, "documents"))


@query(
    "vocab_stats_documents",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    )
    SELECT token,
           CAST(COUNT(*) AS BIGINT) AS term_freq,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
    FROM ex GROUP BY token
    """,
)
def vocab_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary statistics (term + document frequency per
    token) — vocabulary-sized output no matter the corpus size."""
    return X.vocab_stats(t(spark, sf_dir, "documents")).select(
        "token",
        F.col("term_freq").cast("long").alias("term_freq"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
    )


@query(
    "stratified_sample_documents",
    oracle="""
    SELECT doc_id, lang, source
    FROM documents
    WHERE CAST(('0x' || substr(md5('7|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            % 1000000
          < CASE lang WHEN 'en' THEN 500000 WHEN 'de' THEN 250000
                      WHEN 'fr' THEN 100000 ELSE 0 END
    """,
)
def stratified_sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language data mixing (50% en / 25% de /
    10% fr / drop the rest): membership is a pure function of the
    doc id's portable hash, so the oracle reproduces the exact
    subset — something `df.sample()`'s partition-seeded RNG cannot."""
    return P.stratified_sample(
        t(spark, sf_dir, "documents"),
        "lang",
        {"en": 0.5, "de": 0.25, "fr": 0.10},
        key_col="doc_id",
        seed=7,
    ).select("doc_id", "lang", "source")


@query(
    "hash_split_documents",
    oracle="""
    SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM (
      SELECT CASE WHEN g < 800000 THEN 'train'
                  WHEN g < 900000 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT CAST(('0x' || substr(md5('3|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                     % 1000000 AS g
            FROM documents)
    ) GROUP BY split
    """,
)
def hash_split_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment — the same doc
    lands in the same split on every run and engine (leak-proof
    validation sets), which the oracle verifies row-for-row before the
    summary count."""
    out = P.hash_split(
        t(spark, sf_dir, "documents"), "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1}, seed=3,
    )
    return out.groupBy("split").agg(F.count(F.lit(1)).cast("long").alias("n_docs"))


@query(
    "upsample_documents",
    oracle="""
    SELECT doc_id, CAST(copy_idx AS BIGINT) AS copy_idx
    FROM (
      SELECT doc_id,
             unnest(range(1, 3 + CASE WHEN CAST(('0x' || substr(md5('11|' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                                            % 1000000 < 300000
                                 THEN 1 ELSE 0 END)) AS copy_idx
      FROM documents)
    """,
)
def upsample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 2.3× fractional upsampling: two copies of every
    doc plus a hash-gated third for 30% of keys — the exact multiset
    is reproduced by the oracle."""
    return P.upsample(
        t(spark, sf_dir, "documents"), 2.3, "doc_id", seed=11
    ).select("doc_id", F.col("copy_idx").cast("long").alias("copy_idx"))


@query(
    "dedup_keep_best_documents",
    oracle="""
    WITH scored AS (
      SELECT doc_id, lang, n_chars,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM (
      SELECT doc_id, lang, n_chars,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY n_chars DESC, doc_id ASC) AS rn
      FROM scored
    ) WHERE rn = 1
    """,
)
def dedup_keep_best_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keeping the BEST duplicate (here: most characters,
    id tie-break) instead of an arbitrary one — the curation policy
    when duplicates differ in truncation."""
    return D.exact_dedup(
        t(spark, sf_dir, "documents"), "doc_id", score_col="n_chars",
        keep_cols=("doc_id", "lang", "n_chars"),
    )


@query(
    "quality_top_quartile_per_lang",
    oracle="""
    WITH f AS (
      SELECT doc_id, lang,
             CAST(length(text) AS DOUBLE) AS n_chars_obs,
             CAST(len(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter(list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> ''),
                  tk -> list_contains(['the','and','of','to','a','in','is','it','you','that'], tk))) AS DOUBLE) AS sw
      FROM documents
    ), scored AS (
      SELECT doc_id, lang,
             0.4 * least(n_tokens / 100.0, 1.0)
               + 0.3 * (1.0 - least((CASE WHEN n_chars_obs > 0 THEN n_punct / n_chars_obs ELSE 0.0 END) * 10, 1.0))
               + 0.3 * least((CASE WHEN n_tokens > 0 THEN sw / n_tokens ELSE 0.0 END) * 4, 1.0) AS quality_score
      FROM f
    )
    SELECT doc_id, lang, quality_score FROM (
      SELECT doc_id, lang, quality_score,
             PERCENT_RANK() OVER (PARTITION BY lang ORDER BY quality_score DESC, doc_id ASC) AS pr
      FROM scored
    ) WHERE pr <= 0.25
    """,
)
def quality_top_quartile_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group percentile gating — keep each language's top quality
    quartile: the curation policy when absolute thresholds would
    starve low-resource languages. One window pass per group; the
    doc-id tie-break makes the kept set deterministic."""
    from pyspark.sql import Window

    scored = X.quality_features(
        X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id")
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("quality_score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") <= 0.25)
        .select("doc_id", "lang", "quality_score")
    )


@query(
    "distinctive_terms_documents",
    oracle=f"""
    WITH ex AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM ex GROUP BY doc_id, token
    ), dfreq AS (
      SELECT token, COUNT(*) AS doc_freq
      FROM (SELECT DISTINCT doc_id, token FROM ex) GROUP BY token
    )
    SELECT doc_id, token,
           CAST(tf AS BIGINT) AS tf,
           CAST(doc_freq AS BIGINT) AS doc_freq,
           CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT tf.doc_id, tf.token, tf.tf, dfreq.doc_freq,
             ROW_NUMBER() OVER (
               PARTITION BY tf.doc_id
               ORDER BY CAST(tf.tf AS DOUBLE) / CAST(dfreq.doc_freq AS DOUBLE) DESC,
                        tf.token ASC
             ) AS rank
      FROM tf JOIN dfreq USING (token)
    ) WHERE rank <= 3
    """,
)
def distinctive_terms_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 most distinctive terms per document (tf / corpus doc-freq,
    the transcendental-free tf-idf ranking — exactly reproducible
    doubles, term-ascending tie-break)."""
    return X.distinctive_terms(t(spark, sf_dir, "documents"), k=3)


@query(
    "winnow_fingerprints_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), h AS (
      SELECT doc_id,
             list_transform(
               list_transform(range(len(t) - 2), i -> t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]),
               g -> CAST(('0x' || substr(md5('0|' || g), 1, 15)) AS BIGINT)
             ) AS hs,
             len(t) AS n
      FROM toks
    ), wins AS (
      SELECT doc_id,
             CASE WHEN n >= 6
                  THEN list_distinct(list_transform(range(len(hs) - 3),
                         j -> list_min(list_slice(hs, j + 1, j + 4))))
                  ELSE [] END AS fps
      FROM h
    )
    SELECT DISTINCT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM wins
    """,
)
def winnow_fingerprints_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (k=3-token grams, window w=4): the
    rolling min-hash fingerprint set every engine reproduces exactly —
    the ordered-substring-reuse detector alongside MinHash's
    set-overlap."""
    return X.winnow_fingerprints(t(spark, sf_dir, "documents"), k=3, w=4)


@query(
    "dedup_exact_documents",
    oracle="""
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    JOIN (
      SELECT MIN(doc_id) AS keeper
      FROM documents
      GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
    ) k ON d.doc_id = k.keeper
    """,
)
def dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: lowest-id representative per content fingerprint."""
    return D.exact_dedup(
        t(spark, sf_dir, "documents"), "doc_id",
        keep_cols=("doc_id", "lang", "source"),
    )


@query(
    "ngram_jaccard_near_dups",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS s FROM toks WHERE len(t) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) AS jaccard
    FROM sh a JOIN sh b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE) >= 0.5
    """,
)
def ngram_jaccard_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by word-3-gram Jaccard ≥ 0.5 — engine side
    uses the inverted-index self-join (never a cross join); the oracle
    brute-forces the same metric. This registry spelling is the EXACT
    metric benched across the sf0.1→sf2 decade, so it knowingly opts
    out of the default candidate-pair guard (the dense-regime cost is
    documented in SCALE.md; production callers keep the default-on
    ``max_candidate_pairs`` rail)."""
    return D.ngram_jaccard_pairs(
        t(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=0.5,
        max_candidate_pairs=None,
    )


@query(
    "minhash_signatures_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS s FROM toks WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, unnest(s) AS s FROM sh
    ), g AS (
      SELECT gs AS i FROM generate_series(0, 15) t(gs)
    )
    SELECT ex.doc_id AS doc, CAST(g.i AS INTEGER) AS i,
           MIN(CAST(('0x' || substr(md5(CAST(g.i AS VARCHAR) || '|' || ex.s), 1, 15)) AS BIGINT)) AS minhash
    FROM ex CROSS JOIN g
    GROUP BY doc, g.i
    """,
)
def minhash_signatures_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable MinHash signatures (16 md5-derived hash functions over
    word-3-gram shingles), exploded to scalar rows so the oracle can
    hash them. Production path uses xxhash64 (portable=False)."""
    sigs = D.minhash_signatures(
        t(spark, sf_dir, "documents"), "doc_id", "text", num_hashes=16, portable=True
    )
    return sigs.select("doc", F.posexplode("sig").alias("i", "minhash"))


@query(
    "embedding_cosine_topk",
    oracle="""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    norms AS (
      SELECT CAST(list_aggregate(list_transform(qv,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE) AS nq
      FROM q
    ),
    scored AS (
      SELECT e.vec_id,
             CAST(list_aggregate(list_transform(range(len(e.embedding)),
               i -> CAST(CAST(e.embedding[i+1] AS DOUBLE) * CAST(q.qv[i+1] AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE) AS dot,
             CAST(list_aggregate(list_transform(e.embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE) AS ne
      FROM embeddings e, q
    )
    SELECT vec_id, dot / (sqrt(ne) * sqrt(nq)) AS cosine
    FROM scored, norms
    ORDER BY cosine DESC, vec_id
    LIMIT 10
    """,
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force ANN baseline: top-10 by cosine against the vec_id=0
    query vector. Exact-decimal dot products keep both engines
    bit-identical; the plan is scan → TakeOrderedAndProject."""
    emb = t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    return S.cosine_topk(emb, qvec, k=10)


@query(
    "embedding_near_dup_pairs",
    oracle="""
    WITH n AS (
      SELECT vec_id, embedding,
             CAST(list_aggregate(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE) AS nn
      FROM embeddings
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           CAST(list_aggregate(list_transform(range(len(a.embedding)),
             i -> CAST(CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE)
             / (sqrt(a.nn) * sqrt(b.nn)) AS cosine
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE CAST(list_aggregate(list_transform(range(len(a.embedding)),
             i -> CAST(CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE)
             / (sqrt(a.nn) * sqrt(b.nn)) >= 0.4
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (θ ≥ 0.4 on this corpus)."""
    return D.embedding_near_dup_pairs(
        t(spark, sf_dir, "embeddings"), threshold=0.4
    )


@query(
    "multimodal_media_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           md5(text) AS checksum
    FROM documents
    """,
)
def multimodal_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: attach a media struct (content bytes +
    typed metadata) and read the metadata back — all JVM-side."""
    withm = M.attach_media_from_text(t(spark, sf_dir, "documents"))
    return withm.select(
        "doc_id",
        F.col("media.meta.byte_len").alias("byte_len"),
        F.col("media.meta.checksum").alias("checksum"),
    )


@query(
    "multimodal_image_dims",
    oracle="""
    SELECT doc_id,
           CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
                WHEN 2 THEN 'gif' ELSE 'bmp' END AS format,
           CAST(16 + doc_id % 509 AS BIGINT) AS width,
           CAST(16 + (doc_id * 7) % 389 AS BIGINT) AS height
    FROM documents
    """,
)
def multimodal_image_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free image metadata: synthesize format-correct PNG / JPEG
    (APP0+COM segments before SOFn) / GIF / BMP header bytes with
    doc_id-derived dimensions, then parse format/width/height back from
    the RAW BYTES with pure Column ops (``image_header_meta``). The
    oracle recomputes the planted dimensions from doc_id arithmetic, so
    a green row proves the parser exactly inverts real byte encodings —
    including the bounded JPEG segment walk. Engine extension (no
    reference counterpart; the brief's multimodal ask)."""
    docs = t(spark, sf_dir, "documents")
    w = (F.lit(16) + F.col("doc_id") % 509).cast("long")
    h = (F.lit(16) + (F.col("doc_id") * 7) % 389).cast("long")
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("gif"), F.lit("bmp")),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    synth = docs.select(
        "doc_id", M.synthesize_image_bytes(w, h, fmt).alias("content")
    )
    return M.image_header_meta(synth, "content").select(
        "doc_id", "format", "width", "height"
    )


@query(
    "multimodal_audio_meta",
    oracle="""
    SELECT doc_id,
           CAST(1 + doc_id % 2 AS BIGINT) AS channels,
           CAST(CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 8000 WHEN 1 THEN 16000
                WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS BIGINT)
             AS sample_rate,
           CAST(CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 8 WHEN 1 THEN 16
                WHEN 2 THEN 24 ELSE 32 END AS BIGINT) AS bits,
           CAST(100 + doc_id % 9973 AS BIGINT) AS n_frames,
           (100 + doc_id % 9973) * 1000
             // CAST(CASE CAST(doc_id % 5 AS INTEGER) WHEN 0 THEN 8000 WHEN 1 THEN 16000
                     WHEN 2 THEN 22050 WHEN 3 THEN 44100 ELSE 48000 END AS BIGINT)
             AS duration_ms
    FROM documents
    """,
)
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free audio metadata: synthesize spec-correct WAV (RIFF/PCM)
    header bytes with doc_id-derived parameters — every third payload
    interleaves a LIST/INFO chunk before data, so the parser must
    genuinely walk the chunk chain — then parse channels / sample rate
    / bit depth / frame count / duration back from the RAW BYTES with
    pure Column ops (``wav_header_meta``). The oracle recomputes the
    planted parameters from doc_id arithmetic, so a green row proves
    the parser exactly inverts the byte encoding. Audio analog of
    ``multimodal_image_dims`` (engine extension, brief's multimodal
    ask)."""
    docs = t(spark, sf_dir, "documents")
    rate = F.element_at(
        F.array(*[F.lit(v) for v in (8000, 16000, 22050, 44100, 48000)]),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    channels = (F.lit(1) + F.col("doc_id") % 2).cast("long")
    bits = F.element_at(
        F.array(*[F.lit(v) for v in (8, 16, 24, 32)]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    frames = (F.lit(100) + F.col("doc_id") % 9973).cast("long")
    synth = docs.select(
        "doc_id",
        M.synthesize_wav_bytes(
            rate, channels, bits, frames,
            with_list_chunk=F.col("doc_id") % 3 == 0,
        ).alias("content"),
    )
    return M.wav_header_meta(synth, "content").select(
        "doc_id", "channels", "sample_rate", "bits", "n_frames", "duration_ms"
    )


# --- engine-only (rows-only driver check; pytest-verified) --------------


@query("minhash_lsh_dedup_documents")
def minhash_lsh_dedup_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup removal (xxhash64 fast path, Jaccard
    verification ≥ 0.8). Not SQL-expressible (xxhash64); verified in
    tests/test_training_ops.py with planted duplicates."""
    return D.minhash_lsh_dedup(
        t(spark, sf_dir, "documents"), "doc_id", "text", verify_threshold=0.8
    ).select("doc_id", "lang", "source")


@query("simhash_near_dup_candidates")
def simhash_near_dup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash band-collision candidate pairs (xxhash64-based)."""
    return D.simhash_near_dup_pairs(t(spark, sf_dir, "documents"), "doc_id")


@query(
    "simhash_portable_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), ex AS (
      SELECT doc_id, unnest(t) AS tok FROM toks
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('0|' || tok), 1, 15)) AS BIGINT) AS h
      FROM ex
    ), bits AS (
      SELECT doc_id, g.i,
             SUM(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT CAST(gs AS INTEGER) AS i
                         FROM generate_series(0, 59) t(gs)) g
      GROUP BY doc_id, g.i
    )
    SELECT doc_id AS doc,
           CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i)
               ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS h
    FROM bits GROUP BY doc
    """,
)
def simhash_portable_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable SimHash: 60-bit md5-derived token hashes,
    per-bit sign-of-sum — exact cross-engine agreement on every
    signature. The production path stays on 64-bit xxhash64."""
    return D.simhash_table(t(spark, sf_dir, "documents"), "doc_id", portable=True)


@query(
    "minhash_lsh_dedup_portable",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS s FROM toks WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, unnest(s) AS s FROM sh
    ), g AS (
      SELECT CAST(gs AS INTEGER) AS i FROM generate_series(0, 15) t(gs)
    ), sig AS (
      SELECT ex.doc_id AS doc, g.i AS i,
             MIN(CAST(('0x' || substr(md5(CAST(g.i AS VARCHAR) || '|' || ex.s), 1, 15)) AS BIGINT)) AS h
      FROM ex CROSS JOIN g
      GROUP BY doc, g.i
    ), banded AS (
      SELECT doc, i // 4 AS band,
             CAST(('0x' || substr(md5(CAST(i // 4 AS VARCHAR) || '|' ||
                 string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)), 1, 15))
               AS BIGINT) AS bucket
      FROM sig GROUP BY doc, i // 4
    ), cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    ), verified AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.8
    ), losers AS (
      SELECT DISTINCT doc_b FROM verified
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN losers l ON d.doc_id = l.doc_b
    WHERE l.doc_b IS NULL
    """,
)
def minhash_lsh_dedup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash-LSH near-dup removal on the portable (md5-derived)
    hash family — the entire pipeline (signatures → 4-row bands →
    candidate pairs → Jaccard ≥ 0.8 verification → min-id survivor
    anti-join) is reproduced in the oracle SQL, so the exact survivor
    set is cross-engine checked. Production runs use the xxhash64 fast
    path (`minhash_lsh_dedup_documents`, rows-only).

    Bucket-key identity (r15, closing ADVICE r13 #1 / VERDICT r14 ask
    #5): the oracle now computes the engine's EXACT band bucket — the
    60-bit md5-prefix long of ``"{band}|{h0},{h1},...}"`` (the
    ``_portable_hash`` family, band index as seed) — so both engines
    share one collision class and the candidate sets are key-identical
    by construction, not merely equal modulo 60-bit-prefix collisions
    filtered by the Jaccard ≥ 0.8 verify. Survivor EXACT-ness rests on
    key identity again (the r13–r14 weaker guarantee is retired)."""
    return D.minhash_lsh_dedup(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        verify_threshold=0.8, portable=True,
    ).select("doc_id", "lang", "source")


@query(
    "simhash_near_dup_portable",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), ex AS (
      SELECT doc_id, unnest(t) AS tok FROM toks
    ), h AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5('0|' || tok), 1, 15)) AS BIGINT) AS h
      FROM ex
    ), bits AS (
      SELECT doc_id, g.i,
             SUM(CASE WHEN (h >> g.i) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM h CROSS JOIN (SELECT CAST(gs AS INTEGER) AS i
                         FROM generate_series(0, 59) t(gs)) g
      GROUP BY doc_id, g.i
    ), sim AS (
      SELECT doc_id AS doc,
             CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << i)
                 ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS h
      FROM bits GROUP BY doc
    ), banded AS (
      SELECT doc, g.b AS band, (h >> (g.b * 15)) & 32767 AS bucket
      FROM sim CROSS JOIN (SELECT CAST(gs AS INTEGER) AS b
                           FROM generate_series(0, 3) t(gs)) g
    )
    SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
    FROM banded a JOIN banded b
      ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    """,
)
def simhash_near_dup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash band-collision candidates on the portable 60-bit hash
    (4 bands × 15 bits — any pair within Hamming distance 3 collides):
    the band split and pair generation are oracle-checked end to end.
    Production stays on the 64-bit xxhash64 path."""
    return D.simhash_near_dup_pairs(
        t(spark, sf_dir, "documents"), "doc_id", portable=True
    )


@query(
    "minhash_lsh_dedup_transitive",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS s FROM toks WHERE len(t) >= 3
    ), ex AS (
      SELECT doc_id, unnest(s) AS s FROM sh
    ), g AS (
      SELECT CAST(gs AS INTEGER) AS i FROM generate_series(0, 15) t(gs)
    ), sig AS (
      SELECT ex.doc_id AS doc, g.i AS i,
             MIN(CAST(('0x' || substr(md5(CAST(g.i AS VARCHAR) || '|' || ex.s), 1, 15)) AS BIGINT)) AS h
      FROM ex CROSS JOIN g
      GROUP BY doc, g.i
    ), banded AS (
      SELECT doc, i // 4 AS band,
             CAST(('0x' || substr(md5(CAST(i // 4 AS VARCHAR) || '|' ||
                 string_agg(CAST(h AS VARCHAR), ',' ORDER BY i)), 1, 15))
               AS BIGINT) AS bucket
      FROM sig GROUP BY doc, i // 4
    ), cand AS (
      SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.bucket = b.bucket AND a.doc < b.doc
    ), verified AS (
      SELECT c.doc_a, c.doc_b
      FROM cand c
      JOIN sh sa ON sa.doc_id = c.doc_a
      JOIN sh sb ON sb.doc_id = c.doc_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / CAST(len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)) AS DOUBLE) >= 0.8
    ), edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM verified
      UNION ALL
      SELECT doc_b AS src, doc_a AS dst FROM verified
    ), reach(id, r) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.src, rc.r FROM edges e JOIN reach rc ON e.dst = rc.id
    ), comp AS (
      SELECT id, MIN(r) AS component FROM reach GROUP BY id
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN comp ON d.doc_id = comp.id
    WHERE comp.id = comp.component
    """,
)
def minhash_lsh_dedup_transitive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLUSTER-level near-dup removal: the verified LSH pair graph is
    collapsed to connected components (iterative min-label propagation,
    operators/graph.py) and only each component's minimum id survives —
    a chain A≈B≈C keeps exactly A even though (A, C) never collided in
    a band. The oracle reproduces the closure with a recursive CTE, so
    the exact survivor set is cross-engine checked."""
    return D.minhash_lsh_dedup(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        verify_threshold=0.8, portable=True, transitive=True,
    ).select("doc_id", "lang", "source")


@query("minhash_lsh_dedup_transitive_fast")
def minhash_lsh_dedup_transitive_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production path of cluster-level dedup: xxhash64 signatures
    (JVM intrinsic) + connected components. Same pipeline as the
    oracle-checked `minhash_lsh_dedup_transitive`, which pins the
    semantics on the portable hash family; this one is rows-only."""
    return D.minhash_lsh_dedup(
        t(spark, sf_dir, "documents"), "doc_id", "text",
        verify_threshold=0.8, transitive=True,
    ).select("doc_id", "lang", "source")


@query("ivf_ann_topk")
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k: probe the 4 nearest of 16 clusters
    (hash-spread seeds + 2 Lloyd refinement rounds)."""
    emb = t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    assigned, cents = S.build_ivf_index(emb, num_centroids=16, refine_rounds=2)
    return S.ivf_topk(assigned, cents, qvec, k=10, nprobe=4)


@query("multimodal_decode_stub")
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode plumbing over mapInPandas (deterministic stub
    kernel — container has no codecs; see operators/multimodal.py)."""
    docs = M.attach_media_from_text(
        t(spark, sf_dir, "documents").limit(200)
    )
    return M.decode_image_batch(docs)


@query(
    "curation_pipeline_documents",
    oracle=f"""
    WITH prof(plang, tg, prank) AS (VALUES {_lang_profile_values()}),
    langs(plang, priority) AS (VALUES ('en', 1), ('de', 2), ('fr', 3), ('es', 4)),
    f AS (
      SELECT doc_id, lang, source, text,
             CAST(length(text) AS DOUBLE) AS n_chars_obs,
             CAST(len({_DUCK_TOKS}) AS DOUBLE) AS n_tokens,
             CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS DOUBLE) AS n_punct,
             CAST(len(list_filter({_DUCK_TOKS},
                  tk -> list_contains(['the','and','of','to','a','in','is','it','you','that'], tk))) AS DOUBLE) AS sw
      FROM documents
    ), norm AS (
      SELECT doc_id,
             ' ' || trim(regexp_replace(lower(text), '[^\\p{{L}}]+', ' ', 'g')) || ' ' AS s,
             20 * len(regexp_extract_all(text, '[一-鿿]')) >= length(text)
               AND length(text) > 0 AS is_zh
      FROM documents
    ), tgs AS (
      SELECT doc_id,
             unnest(list_transform(range(1, CAST(length(s) - 1 AS BIGINT)),
                                   i -> substr(s, CAST(i AS INTEGER), 3))) AS tg
      FROM norm WHERE length(s) >= 3
    ), cnts AS (SELECT doc_id, tg, COUNT(*) AS n FROM tgs GROUP BY doc_id, tg),
    ranked AS (
      SELECT doc_id, tg,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY n DESC, tg ASC) AS rd
      FROM cnts QUALIFY rd <= {X.DOC_TOP_TRIGRAMS}
    ), dists AS (
      SELECT r.doc_id, l.plang, l.priority,
             SUM(COALESCE(ABS(r.rd - p.prank), {X.PROFILE_SIZE})) AS dist
      FROM ranked r CROSS JOIN langs l
      LEFT JOIN prof p ON p.plang = l.plang AND p.tg = r.tg
      GROUP BY r.doc_id, l.plang, l.priority
    ), best AS (
      SELECT doc_id, plang
      FROM dists
      QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY dist ASC, priority ASC) = 1
    ), pred AS (
      SELECT n.doc_id,
             CASE WHEN n.is_zh THEN 'zh'
                  ELSE COALESCE(b.plang, 'und') END AS lang_pred
      FROM norm n LEFT JOIN best b ON b.doc_id = n.doc_id
    ), scored AS (
      SELECT f.*,
             0.4 * least(n_tokens / 100.0, 1.0)
               + 0.3 * (1.0 - least((CASE WHEN n_chars_obs > 0 THEN n_punct / n_chars_obs ELSE 0.0 END) * 10, 1.0))
               + 0.3 * least((CASE WHEN n_tokens > 0 THEN sw / n_tokens ELSE 0.0 END) * 4, 1.0) AS quality_score,
             p.lang_pred
      FROM f JOIN pred p USING (doc_id)
    ), kept AS (
      SELECT * FROM scored WHERE quality_score >= 0.5 AND lang_pred = lang
    ), dedup AS (
      SELECT k.* FROM kept k
      JOIN (
        SELECT MIN(doc_id) AS keeper
        FROM kept
        GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
      ) m ON k.doc_id = m.keeper
    )
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_tokens AS BIGINT)) AS BIGINT) AS total_tokens
    FROM dedup
    GROUP BY lang, source
    """,
)
def curation_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: quality-score filter → predicted
    language (Cavnar-Trenkle trigram classifier, the default
    `language_id` path since round 7) must match the labeled one →
    exact dedup → per-(lang, source) doc and token budget. Single
    lineage, no collects; the shuffles are the per-doc trigram count,
    the dedup fingerprint, and the final group-by. The oracle replays
    the full trigram out-of-place-distance classification against the
    same broadcast profile literals."""
    docs = X.language_id(
        X.quality_features(X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id"))
    )
    kept = docs.filter(
        (F.col("quality_score") >= 0.5) & (F.col("lang_pred") == F.col("lang"))
    )
    dd = D.exact_dedup(kept, "doc_id", keep_cols=("lang", "source", "n_tokens"))
    return dd.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_tokens").cast("long")).alias("total_tokens"),
    )


_DUCK_SELF_DOT = (
    "CAST(list_aggregate(list_transform({v}, "
    "x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE)"
)
_DUCK_PAIR_DOT = (
    "CAST(list_aggregate(list_transform(range(len({a})), "
    "i -> CAST(CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE)"
)


@query(
    "batch_ann_topk_per_query",
    oracle=f"""
    WITH qs AS (
      SELECT vec_id AS query_id, embedding AS qv,
             {_DUCK_SELF_DOT.format(v='embedding')} AS nnq
      FROM embeddings WHERE vec_id IN (0, 1, 2)
    ), n AS (
      SELECT vec_id, embedding,
             {_DUCK_SELF_DOT.format(v='embedding')} AS nn
      FROM embeddings
    ), scored AS (
      SELECT qs.query_id, n.vec_id,
             {_DUCK_PAIR_DOT.format(a='n.embedding', b='qs.qv')}
               / (sqrt(n.nn) * sqrt(qs.nnq)) AS cosine
      FROM n CROSS JOIN qs
    )
    SELECT query_id, vec_id, cosine, CAST(rk AS INTEGER) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def batch_ann_topk_per_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN: top-5 per query vector for a broadcast query set —
    corpus never shuffles; the only wide stage is the per-query window."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return S.cosine_topk_per_query(emb, queries, k=5)


@query(
    "bpe_token_count_documents",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+'))
                AS INTEGER) AS n_bpe_tokens
    FROM documents
    """,
)
def bpe_token_count_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token counting (match-based BPE-pre-tokenizer
    pattern — identical matches under Java regex and RE2)."""
    return X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", X.bpe_ish_token_count("text").alias("n_bpe_tokens")
    )


@query(
    "embedding_near_dup_bucketed",
    oracle="""
    WITH n AS (
      SELECT vec_id, embedding,
             CAST(list_aggregate(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE) AS nn
      FROM embeddings
    )
    SELECT COUNT(*) AS n_brute_pairs,
           TRUE AS subset_ok, TRUE AS recall_ok
    FROM n a JOIN n b ON a.vec_id < b.vec_id
    WHERE CAST(list_aggregate(list_transform(range(len(a.embedding)),
             i -> CAST(CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE)
             / (sqrt(a.nn) * sqrt(b.nn)) >= 0.4
    """,
)
def embedding_near_dup_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCTION path for embedding near-dup: IVF-bucketed equi-join
    pair generation (no nested-loop join anywhere; the quadratic term
    is sum of per-bucket squares). Cross-bucket pairs are the accepted
    approximation, so exact pair output isn't oracle-comparable;
    instead the oracle checks invariants: the brute-force pair count
    (computed exactly by both engines), bucketed ⊆ brute (precision 1
    — every emitted pair passes the exact cosine filter), and recall ≥
    0.8 vs brute with probe-2 assignment (measured 0.92-0.95). The
    corpus is random vectors (max pair cosine ≈ 0.5), the worst case
    for coarse quantization; on a real near-dup corpus (θ ≥ 0.9,
    duplicated vectors) same-centroid quantization gives recall ≈ 1 —
    pinned with planted vectors in tests/test_training_ops.py.

    The brute side is O(n²) BY DEFINITION, so like the semantic-dedup
    verify pass it is size-guarded: above ``_EMB_BRUTE_VERIFY_CAP``
    vectors BOTH sides run on the same deterministic xxhash64-gated
    subcorpus (~cap vectors), so every invariant is still exercised
    end-to-end at any scale while the comparison stays O(cap²). The
    driver's oracle evaluates at sf0.01 (500 vectors, under the cap),
    where the whole corpus is compared. The full-corpus PRODUCTION
    path is exercised at scale by its bench twin
    (`embedding_near_dup_bucketed_pairs`)."""
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    if n > _EMB_BRUTE_VERIFY_CAP:
        gate = max(2, n // (_EMB_BRUTE_VERIFY_CAP // 2))
        emb = emb.filter(F.pmod(F.xxhash64(F.col("vec_id")), F.lit(gate)) == 0)
    brute = D.embedding_near_dup_pairs(emb, threshold=0.4).select("id_a", "id_b")
    bucketed = D.embedding_near_dup_pairs_bucketed(
        emb, threshold=0.4, num_buckets=4, probe=2
    ).select("id_a", "id_b")
    joined = brute.withColumn("__b", F.lit(1)).join(
        bucketed.withColumn("__k", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    return joined.agg(
        F.sum("__b").cast("long").alias("n_brute_pairs"),
        (F.sum(F.when(F.col("__b").isNull(), 1).otherwise(0)) == 0).alias("subset_ok"),
        (
            F.sum(F.when(F.col("__b").isNotNull() & F.col("__k").isNotNull(), 1).otherwise(0))
            >= 0.8 * F.sum("__b")
        ).alias("recall_ok"),
    )


@query("multimodal_video_frames")
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: every Nth 16-byte chunk as a
    'frame' with checksum (stub kernel; mapInPandas contract is the
    tested part)."""
    docs = M.attach_media_from_text(t(spark, sf_dir, "documents").limit(100))
    return M.sample_video_frames(docs, every_n=2, max_frames=4)


@query("multimodal_audio_features")
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature extraction plumbing (RMS/duration over stub PCM)."""
    docs = M.attach_media_from_text(t(spark, sf_dir, "documents").limit(200))
    return M.extract_audio_features(docs)


@query(
    "fastpath_parity_checks",
    oracle="""
    SELECT 'minhash_fast_vs_portable' AS invariant, TRUE AS ok
    UNION ALL SELECT 'transitive_fast_vs_portable', TRUE
    UNION ALL SELECT 'simhash_band_guarantee', TRUE
    """,
)
def fastpath_parity_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable invariants for the xxhash64 production fast
    paths, whose raw outputs aren't SQL-expressible. Three checks,
    computed entirely Spark-side and returned as (invariant, ok) rows
    the oracle pins to TRUE:

    - minhash_fast_vs_portable: the survivor sets of the fast
      (xxhash64) and portable (md5, itself oracle-exact in
      `minhash_lsh_dedup_portable`) LSH dedups may differ only where
      LSH candidate generation differs between hash families; with
      Jaccard >= 0.8 verification both paths agree on every shared
      candidate, so the symmetric difference must stay within
      max(5, 1%) of the corpus (measured: 1 doc of 500).
    - transitive_fast_vs_portable: same bound for the cluster-level
      (connected-components) variant.
    - simhash_band_guarantee: the structural LSH property — any pair
      within Hamming distance < bands of each other MUST collide in at
      least one of the 4 bands (pigeonhole), so the set of Hamming<=3
      pairs minus the candidate set is empty. Quadratic by nature, so
      the check caps the corpus at 2000 docs (documented; the
      guarantee itself is size-independent).
    """
    docs = t(spark, sf_dir, "documents")
    total = docs.agg(F.count(F.lit(1)).alias("__n"))

    def survivors(portable: bool, transitive: bool) -> DataFrame:
        return D.minhash_lsh_dedup(
            docs, "doc_id", "text", verify_threshold=0.8,
            portable=portable, transitive=transitive,
        ).select(F.col("doc_id").alias("id"))

    def symdiff_row(name: str, fast: DataFrame, port: DataFrame) -> DataFrame:
        j = fast.withColumn("__f", F.lit(1)).join(
            port.withColumn("__p", F.lit(1)), "id", "full_outer"
        )
        return (
            j.agg(
                F.sum(
                    F.when(F.col("__f").isNull() | F.col("__p").isNull(), 1).otherwise(0)
                ).alias("__d")
            )
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(name).alias("invariant"),
                (
                    F.coalesce(F.col("__d"), F.lit(0))
                    <= F.greatest(F.lit(5.0), 0.01 * F.col("__n"))
                ).alias("ok"),
            )
        )

    r1 = symdiff_row(
        "minhash_fast_vs_portable", survivors(False, False), survivors(True, False)
    )
    r2 = symdiff_row(
        "transitive_fast_vs_portable", survivors(False, True), survivors(True, True)
    )

    capped = docs.orderBy("doc_id").limit(2000)
    sh = D.simhash_table(capped, "doc_id")
    close = (
        sh.select(F.col("doc").alias("doc_a"), F.col("h").alias("ha"))
        .join(
            sh.select(F.col("doc").alias("doc_b"), F.col("h").alias("hb")),
            F.col("doc_a") < F.col("doc_b"),
        )
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
        .select("doc_a", "doc_b")
    )
    cand = D.simhash_near_dup_pairs(capped, "doc_id")
    missing = close.join(cand, ["doc_a", "doc_b"], "left_anti")
    r3 = missing.agg((F.count(F.lit(1)) == 0).alias("ok")).select(
        F.lit("simhash_band_guarantee").alias("invariant"), "ok"
    )
    return r1.unionByName(r2).unionByName(r3)


@query(
    "ivf_recall_check",
    oracle="""
    SELECT 'ivf_recall' AS invariant, TRUE AS ok
    UNION ALL SELECT 'ivf_bucket_balance', TRUE
    """,
)
def ivf_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable invariants for the IVF ANN path (whose top-k
    output is approximate, so not directly oracle-comparable):

    - ivf_recall: probing half the clusters (nprobe=8 of 16, two Lloyd
      refinement rounds on the hash-spread seeds) recovers >= half of
      the brute-force top-10 for the fixed query vector. The corpus is
      random 64-dim vectors — the worst case for coarse quantization
      (measured recall 0.8 here; clustered real corpora sit near 1) —
      so the bound is a regression canary for the index plumbing, not
      a quality claim.
    - ivf_bucket_balance: hash-spread + refined centroids must keep
      the largest bucket within 2.5x the mean — the skew guard for the
      bucketed near-dup join.
    """
    emb = t(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 7).first()["embedding"]]
    assigned, cents = S.build_ivf_index(emb, num_centroids=16, refine_rounds=2)
    brute = S.cosine_topk(emb, qvec, k=10).select(F.col("vec_id").alias("id"))
    ivf = S.ivf_topk(assigned, cents, qvec, k=10, nprobe=8).select(
        F.col("vec_id").alias("id")
    )
    r1 = (
        brute.join(ivf, "id", "left_semi")
        .agg((F.count(F.lit(1)) >= 5).alias("ok"))
        .select(F.lit("ivf_recall").alias("invariant"), "ok")
    )
    sizes = assigned.groupBy("__cluster").agg(F.count(F.lit(1)).alias("n"))
    r2 = sizes.agg((F.max("n") <= 2.5 * F.avg("n")).alias("ok")).select(
        F.lit("ivf_bucket_balance").alias("invariant"), "ok"
    )
    return r1.unionByName(r2)


_DUCK_PHASH = (
    "CAST(('0x' || substr(md5('{seed}|' || CAST({v} AS VARCHAR)), 1, 15)) AS BIGINT)"
)


@query(
    "training_order_documents",
    oracle=f"""
    SELECT doc_id,
           {_DUCK_PHASH.format(seed=0, v='doc_id')} AS train_order_key
    FROM documents
    ORDER BY train_order_key, doc_id
    LIMIT 100
    """,
)
def training_order_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle
    (sampling.deterministic_order): the corpus sorted by a portable
    content hash of the key — reproducible across runs, cluster shapes,
    and engines, decorrelating training position from ingestion order.
    Plans as TakeOrderedAndProject here (first 100 positions); the full
    materialization is one range-partition exchange. The order KEY is
    emitted so the oracle checks the order derivation itself, not just
    set membership."""
    docs = X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.select("doc_id", P.order_key("doc_id").alias("train_order_key"))
        .orderBy("train_order_key", "doc_id")
        .limit(100)
    )


@query(
    "token_budget_per_source",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({{toks}}) AS INTEGER) AS n_tokens,
             {_DUCK_PHASH.format(seed=0, v='doc_id')} AS ok
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY ok, doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, source, n_tokens FROM c WHERE cum <= 800
    """.replace("{toks}", _DUCK_TOKS),
)
def token_budget_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget capping (sampling.cap_tokens_per_group):
    keep a deterministic-shuffle prefix of each source worth at most
    800 tokens — the quota step of a data mix. One window shuffle keyed
    on the source."""
    docs = X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", "source", X.token_count("text").alias("n_tokens")
    )
    return P.cap_tokens_per_group(
        docs, "source", "n_tokens", budget=800, key_col="doc_id"
    )


@query(
    "contamination_check_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_DUCK_SHINGLES} AS s FROM toks WHERE len(t) >= 3
    ), gate AS (
      SELECT doc_id,
             {_DUCK_PHASH.format(seed=7, v='doc_id')} % 1000000 AS g
      FROM documents
    ), ev AS (
      SELECT sh.doc_id, sh.s FROM sh JOIN gate USING (doc_id) WHERE gate.g < 100000
    ), tr AS (
      SELECT sh.doc_id, sh.s FROM sh JOIN gate USING (doc_id) WHERE gate.g >= 100000
    ), trex AS (
      SELECT doc_id AS train_id, unnest(s) AS g FROM tr
    ), allowed AS (
      SELECT g FROM trex GROUP BY g HAVING COUNT(*) <= 100
    ), evex AS (
      SELECT doc_id AS eval_id, unnest(s) AS g FROM ev
    ), common AS (
      SELECT e.eval_id, t.train_id, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM evex e JOIN allowed USING (g) JOIN trex t USING (g)
      GROUP BY e.eval_id, t.train_id
    ), scored AS (
      SELECT c.eval_id, c.train_id, c.n_common,
             CAST(c.n_common AS DOUBLE) / CAST(len(ev.s) AS DOUBLE) AS overlap,
             ROW_NUMBER() OVER (PARTITION BY c.eval_id
                                ORDER BY CAST(c.n_common AS DOUBLE) / CAST(len(ev.s) AS DOUBLE) DESC,
                                         c.train_id ASC) AS rk
      FROM common c JOIN ev ON ev.doc_id = c.eval_id
    )
    SELECT eval_id, overlap AS max_overlap, train_id, n_common
    FROM scored WHERE rk = 1
    """,
)
def contamination_check_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan (dedup.cross_ngram_contamination):
    a deterministic 10% hash split of the corpus plays the eval set,
    the rest the training set; for every eval doc the query reports
    the best-matching train doc by shingle-overlap fraction. Shape:
    inverted-index join on the shingle — the shuffle key is the
    n-gram, never an all-pairs join."""
    docs = X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id")
    gate = P._gate("doc_id", seed=7)
    ev = docs.filter(gate < 100_000)
    tr = docs.filter(gate >= 100_000)
    return D.cross_ngram_contamination(tr, ev, stop_shingle_cap=100)


@query(
    "pack_sequences_documents",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len({_DUCK_TOKS})) AS BIGINT) AS total_tokens,
           TRUE AS bins_within_capacity,
           TRUE AS packing_efficient
    FROM documents
    """,
)
def pack_sequences_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing (sampling.pack_sequences) of the corpus
    into 256-token context windows — Arrow-batched applyInPandas per
    deterministic hash shard (next-fit over the reproducible shuffle
    order; bin boundaries depend on a running remainder no window
    function can express). The oracle pins the exact doc/token totals
    (every doc packed exactly once, token mass preserved) plus two
    Spark-side invariants: no non-oversize bin exceeds capacity, and
    bin count stays within the next-fit bound of 2x optimal plus one
    tail bin per shard."""
    capacity, shards = 256, 8
    docs = X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id").select(
        "doc_id", X.token_count("text").alias("n_tokens")
    )
    packed = P.pack_sequences(docs, "doc_id", "n_tokens", capacity, num_shards=shards)
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    bin_stats = per_bin.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum(
            F.when(
                (F.col("has_oversize") == 0) & (F.col("bin_tokens") > capacity), 1
            ).otherwise(0)
        ).alias("over_cap"),
    )
    return (
        packed.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .crossJoin(F.broadcast(bin_stats))
        .select(
            "n_docs",
            "total_tokens",
            (F.col("over_cap") == 0).alias("bins_within_capacity"),
            (
                F.col("n_bins")
                <= 2 * F.ceil(F.col("total_tokens") / capacity) + shards
            ).alias("packing_efficient"),
        )
    )


@query(
    "pii_scrub_documents",
    oracle=r"""
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 10 = 0
                  THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.7 or +1 555-123-4567'
                  ELSE text END AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           CAST(len(regexp_extract_all(text, '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS INTEGER) AS n_ipv4,
           CAST(len(regexp_extract_all(text, '\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}')) AS INTEGER) AS n_phone,
           md5(regexp_replace(regexp_replace(regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IPV4>', 'g'),
               '\+?[0-9]{1,3}[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
    FROM injected
    """,
)
def pii_scrub_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (text.pii_scrub): emails/IPv4s/phone numbers
    counted and redacted with RE2-safe patterns that Java regex and
    RE2 match identically — verified to the md5 of the redacted text.
    The corpus carries no natural PII, so every 10th doc gets a
    synthetic contact line (same expression in both engines) to keep
    the check non-vacuous."""
    docs = X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id").withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".7 or +1 555-123-4567"),
            ),
        ).otherwise(F.col("text")),
    )
    scrubbed = X.pii_scrub(docs)
    return scrubbed.select(
        "doc_id",
        "n_email",
        "n_ipv4",
        "n_phone",
        F.md5("text").alias("redacted_md5"),
    )


@query("embedding_near_dup_bucketed_pairs")
def embedding_near_dup_bucketed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION bucketed near-dup pair output alone (probe-2,
    IVF buckets) — the benchmark surface for the scale path. Its
    correctness is pinned by `embedding_near_dup_bucketed` (the
    invariant query that compares it against the size-guarded brute
    baseline) and the planted/plan tests; this entry exists so the
    bench measures the production join without paying the baseline's
    O(n²) cost. Bucket count scales with corpus size (~125 vectors per
    bucket, one cheap count to size it): per-bucket pair cost is
    (n/B)²·B, so a fixed B tuned at one scale quadratically overpays
    at the next — exactly the knob a 100 TB deployment sets from the
    corpus stats."""
    emb = t(spark, sf_dir, "embeddings")
    nb = max(4, emb.count() // 125)
    return D.embedding_near_dup_pairs_bucketed(
        emb, threshold=0.4, num_buckets=nb, probe=2
    )


@query(
    "chunk_documents_overlap",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
      FROM documents
    ), starts AS (
      SELECT doc_id, t, unnest(range(0, greatest(len(t), 1), 112)) AS s
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id,
           CAST(s // 112 AS INTEGER) AS chunk_id,
           array_to_string(t[s+1 : s+128], ' ') AS chunk_text,
           CAST(least(128, len(t) - s) AS INTEGER) AS n_chunk_tokens
    FROM starts
    WHERE s < len(t) AND (s = 0 OR len(t) > s + 16)
    """,
)
def chunk_documents_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (operators/text.py) — 128-token
    chunks, 16-token overlap (stride 112), case-preserving tokens,
    duplicate tail windows suppressed. Chunk ids are start//stride
    arithmetic, so both engines produce identical rows without any
    ordinality/window construct."""
    return X.chunk_documents(
        X.spread_small_scan(t(spark, sf_dir, "documents"), "doc_id"),
        chunk_tokens=128,
        overlap_tokens=16,
    )


@query(
    "semantic_dedup_survivors",
    oracle="""
    WITH n AS (
      SELECT vec_id, embedding,
             CAST(list_aggregate(list_transform(embedding,
               x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE) AS nn
      FROM embeddings
    ),
    drops AS (
      SELECT DISTINCT b.vec_id
      FROM n a JOIN n b ON a.vec_id < b.vec_id
      WHERE CAST(list_aggregate(list_transform(range(len(a.embedding)),
               i -> CAST(CAST(a.embedding[i+1] AS DOUBLE) * CAST(b.embedding[i+1] AS DOUBLE) AS DECIMAL(30,12))), 'sum') AS DOUBLE)
               / (sqrt(a.nn) * sqrt(b.nn)) >= 0.4
    )
    SELECT e.vec_id, TRUE AS bucketed_superset_ok
    FROM embeddings e LEFT JOIN drops d ON e.vec_id = d.vec_id
    WHERE d.vec_id IS NULL
    ORDER BY e.vec_id
    """,
)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup (operators/dedup.py::semantic_dedup): embedding-space
    near-duplicate removal keeping one representative per group. Two
    runs through the SAME production code path: ``num_buckets=1``
    degenerates the bucketed equi-join to the exact all-pairs semantics
    (oracle-exact survivor list — every surviving vec_id matches the
    SQL greedy keep-lowest-id dedup), and the real coarse-quantized
    configuration (4 buckets, probe 2), whose pair set is a SUBSET of
    the exact pairs by construction, so its survivor set must be a
    SUPERSET of the exact survivors — pinned by the
    ``bucketed_superset_ok`` invariant column. θ = 0.4 because the
    synthetic corpus is random vectors (max pair cosine ≈ 0.5) — the
    recall-worst-case for quantization; real semantic-dup corpora run
    at θ ≥ 0.9 where duplicates share a centroid (planted-vector recall
    pinned in tests/test_training_ops.py).

    The num_buckets=1 exact run is O(n²) BY DESIGN (it exists to be
    oracle-comparable), so it is size-guarded: above
    ``_SEMDEDUP_VERIFY_CAP`` vectors the exact-vs-bucketed comparison
    runs on a deterministic xxhash64-gated subcorpus of ~cap vectors
    (both runs restricted to the same subset, so the superset invariant
    is still exercised end-to-end every execution) and the RETURNED
    survivors are the production bucketed dedup of the full corpus with
    corpus-scaled buckets. The driver's oracle evaluates at sf0.01
    (2,000 vectors, under the cap), where the exact pass runs whole and
    the result is oracle-exact; the cap is what keeps the verification
    harness from becoming the workload at scale (the sf1 decade
    measured the unguarded pass at 290 s for 20k vectors — quadratic,
    SCALE.md).

    Since r14 this query is registry-only (the correctness gate); the
    BENCHED row is ``semantic_dedup_production`` — this one's
    three-pipeline structure measures the verification harness, not
    the operator (VERDICT r13 ask #3)."""
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    caches: list[DataFrame] = []
    verify_src, production = emb, None
    if n > _SEMDEDUP_VERIFY_CAP:
        gate = max(2, n // (_SEMDEDUP_VERIFY_CAP // 2))
        verify_src = emb.filter(
            F.pmod(F.xxhash64(F.col("vec_id")), F.lit(gate)) == 0
        )
        production = D.semantic_dedup(
            emb, threshold=0.4, num_buckets=max(4, n // 125), probe=2,
            refine_rounds=0, cache_registry=caches,
        ).select("vec_id").persist()
    # materialize the (tiny, id-only) survivor sets eagerly so the
    # heavy per-run norm caches the dedup registers can be released
    # BEFORE this function returns — otherwise they stay pinned in
    # executor storage for the session lifetime
    exact = D.semantic_dedup(
        verify_src, threshold=0.4, num_buckets=1, probe=1, refine_rounds=0,
        cache_registry=caches,
    ).select("vec_id").persist()
    bucketed = D.semantic_dedup(
        verify_src, threshold=0.4, num_buckets=4, probe=2, refine_rounds=0,
        cache_registry=caches,
    ).select("vec_id").persist()
    superset_ok = exact.join(bucketed, "vec_id", "left_anti").count() == 0
    if production is not None:
        # materialize the persisted production survivors NOW, while the
        # heavy norm/assignment caches its dedup registered are still
        # live — releasing first would make the caller's action recompute
        # the centroid assignment and exact-decimal norms twice (ADVICE r8)
        production.count()
    D.release_caches(caches)
    bucketed.unpersist(blocking=False)
    out = production if production is not None else exact
    # `out` stays persisted until the caller's action — one id column,
    # KBs; the heavy norm/embedding caches above are already released
    if production is not None:
        exact.unpersist(blocking=False)
    return (
        out.withColumn("bucketed_superset_ok", F.lit(superset_ok))
        .orderBy("vec_id")
    )


@query("semantic_dedup_production")
def semantic_dedup_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION SemDedup pipeline alone (operators/dedup.py::
    semantic_dedup): one bucketed dedup of the full corpus with
    corpus-scaled buckets (n/125 centroids, probe 2) — the exact
    configuration a 100 TB run would use. This is the BENCHED row for
    the semantic-dedup family (VERDICT r13 ask #3): the former benched
    row, ``semantic_dedup_survivors``, runs THREE pipelines (production
    + exact-verify + bucketed-verify with interleaved persists), so its
    wall-clock measured the verification harness — maximally sensitive
    to ambient memory pressure — rather than the operator. That query
    keeps the DuckDB oracle and the exact-vs-bucketed superset
    invariant as a registry-only correctness gate; this one measures
    the operator.

    Rows-only by design (like the xxhash64 fast-path twins): the
    bucketed survivor set depends on the coarse-quantizer centroid
    assignment, which has no tractable SQL spelling. Its correctness
    twin ``semantic_dedup_survivors`` is window-green (oracle-exact
    survivors at sf0.01 and the bucketed-superset invariant exercised
    end-to-end at every size)."""
    emb = t(spark, sf_dir, "embeddings")
    n = emb.count()
    caches: list[DataFrame] = []
    out = D.semantic_dedup(
        emb, threshold=0.4, num_buckets=max(4, n // 125), probe=2,
        refine_rounds=0, cache_registry=caches,
    ).select("vec_id").persist()
    # materialize the (tiny, id-only) survivors eagerly so the heavy
    # norm/assignment caches release BEFORE the caller's action
    out.count()
    D.release_caches(caches)
    return out.orderBy("vec_id")


@query(
    "repeated_span_stats_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    wins AS (
      SELECT doc_id, CAST(i AS BIGINT) AS start,
             array_to_string(ts[CAST(i + 1 AS BIGINT):CAST(i + 8 AS BIGINT)], ' ') AS w
      FROM toks, UNNEST(range(0, len(ts) - 8 + 1)) AS r(i)
      WHERE len(ts) >= 8
    ),
    bad AS (
      SELECT w FROM wins GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT doc_id, start FROM wins WHERE w IN (SELECT w FROM bad)
    ),
    flagged AS (
      SELECT doc_id, start,
             CASE WHEN start > COALESCE(MAX(start + 8) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM marked
    ),
    grp AS (
      SELECT doc_id, start,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, gid, MIN(start) AS s, MAX(start) + 8 AS e
      FROM grp GROUP BY doc_id, gid
    ),
    per_doc AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
             CAST(SUM(e - s) AS BIGINT) AS n_removed
      FROM spans GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.ts) AS INTEGER) AS n_tokens,
           CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(COALESCE(p.n_removed, 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
    ORDER BY t.doc_id
    """,
)
def repeated_span_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup statistics (operators/text.py::
    repeated_span_stats): per-document count and token volume of
    maximal cross-document repeated 8-token spans, with overlapping
    windows merged by the gaps-and-islands pattern. The oracle
    replicates the FULL pipeline in SQL — window extraction,
    doc-frequency filter, island merge — so both the detection and the
    merge arithmetic are hash-exact per document."""
    return X.repeated_span_stats(
        t(spark, sf_dir, "documents"), k=8, min_docs=2
    ).orderBy("doc_id")


@query(
    "excise_repeated_spans_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS ts FROM documents
    ),
    wins AS (
      SELECT doc_id, CAST(i AS BIGINT) AS start,
             array_to_string(ts[CAST(i + 1 AS BIGINT):CAST(i + 8 AS BIGINT)], ' ') AS w
      FROM toks, UNNEST(range(0, len(ts) - 8 + 1)) AS r(i)
      WHERE len(ts) >= 8
    ),
    bad AS (
      SELECT w FROM wins GROUP BY w HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    marked AS (
      SELECT doc_id, start FROM wins WHERE w IN (SELECT w FROM bad)
    ),
    flagged AS (
      SELECT doc_id, start,
             CASE WHEN start > COALESCE(MAX(start + 8) OVER (
                    PARTITION BY doc_id ORDER BY start
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_island
      FROM marked
    ),
    grp AS (
      SELECT doc_id, start,
             SUM(new_island) OVER (PARTITION BY doc_id ORDER BY start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gid
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, gid, MIN(start) AS s, MAX(start) + 8 AS e
      FROM grp GROUP BY doc_id, gid
    ),
    covered AS (
      SELECT doc_id, list(DISTINCT p) AS cov
      FROM spans, UNNEST(range(s, e)) AS u(p)
      GROUP BY doc_id
    )
    SELECT t.doc_id,
           md5(COALESCE(array_to_string(
             list_filter(
               list_transform(range(1, len(t.ts) + 1),
                 i -> CASE WHEN c.cov IS NOT NULL AND list_contains(c.cov, i - 1)
                           THEN NULL ELSE t.ts[i] END),
               x -> x IS NOT NULL),
             ' '), '')) AS text_md5,
           CAST(COALESCE(len(c.cov), 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN covered c ON t.doc_id = c.doc_id
    ORDER BY t.doc_id
    """,
)
def excise_repeated_spans_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate excision end to end (operators/text.py::
    excise_repeated_spans): every cross-document repeated 8-token span
    is removed from every document, and the oracle REBUILDS each
    excised text in SQL (window detection → island merge → covered-
    position filter → token reassembly) and compares md5 per document
    — so the operator's actual output text, not just its accounting,
    is hash-exact. n_removed counts covered token positions (equal to
    summed span lengths; spans never overlap after the merge)."""
    out = X.excise_repeated_spans(
        t(spark, sf_dir, "documents"), k=8, min_docs=2
    )
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.col("n_removed").cast("long").alias("n_removed"),
    ).orderBy("doc_id")


@query(
    "token_frequency_stats_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ), freq AS (
      SELECT token, SUM(tf) AS cnt FROM tf GROUP BY token
    ), tot AS (
      SELECT SUM(cnt) AS n FROM freq
    )
    SELECT tf.doc_id,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
           CAST(SUM(freq.cnt * tf.tf) AS DOUBLE)
             / CAST(SUM(tf.tf) * (SELECT n FROM tot) AS DOUBLE) AS mean_tok_freq,
           CAST(SUM(CASE WHEN freq.cnt <= 2 THEN tf.tf ELSE 0 END) AS DOUBLE)
             / CAST(SUM(tf.tf) AS DOUBLE) AS rare_ratio
    FROM tf JOIN freq USING (token)
    GROUP BY tf.doc_id
    """,
)
def token_frequency_stats_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM-style quality scoring over the documents corpus (see
    operators/text.py::token_frequency_stats): low mean corpus term
    frequency or high rare-token share flags gibberish / OCR noise /
    wrong-language content for the curation gate."""
    return X.token_frequency_stats(t(spark, sf_dir, "documents"))


@query(
    "temperature_mix_documents",
    oracle=f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_available FROM documents GROUP BY source
    ), weighted AS (
      SELECT source, n_available, sqrt(CAST(n_available AS DOUBLE)) AS wgt
      FROM counts
    ), run AS (
      SELECT source, n_available, wgt,
             SUM(wgt) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM weighted
    ), tot AS (
      SELECT source, n_available, wgt,
             MAX(cum) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS wtot
      FROM run
    ), targets AS (
      SELECT source, n_available,
             CAST(FLOOR(200.0 * wgt / wtot) AS BIGINT) AS target_docs
      FROM tot
    ), ranked AS (
      SELECT d.doc_id, d.source,
             ROW_NUMBER() OVER (PARTITION BY d.source
                 ORDER BY {_DUCK_PHASH.format(seed=0, v='d.doc_id')}, d.doc_id)
               AS rk
      FROM documents d
    )
    SELECT r.source, MAX(t.n_available) AS n_available,
           MAX(t.target_docs) AS target_docs,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(r.doc_id) AS BIGINT) AS sum_ids
    FROM ranked r JOIN targets t ON r.source = t.source
    WHERE r.rk <= t.target_docs
    GROUP BY r.source ORDER BY r.source
    """,
)
def temperature_mix_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixing (alpha = 0.5) of the documents corpus into a
    200-doc budget — per-source membership summarized as counts + the
    exact id sum, so the oracle pins WHICH documents were selected,
    not just how many (operators/sampling.py::temperature_mix)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.sampling import (
        temperature_mix,
    )

    mixed = temperature_mix(
        t(spark, sf_dir, "documents"), "source", "doc_id", budget_docs=200
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.max("n_available").alias("n_available"),
            F.max("target_docs").alias("target_docs"),
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("doc_id").alias("sum_ids"),
        )
        .orderBy("source")
    )


@query(
    "curation_mix_pipeline_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token
    ), freq AS (
      SELECT token, SUM(tf) AS cnt FROM tf GROUP BY token
    ), per_doc AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf) AS BIGINT) AS n_tokens,
             CAST(SUM(CASE WHEN freq.cnt <= 2 THEN tf.tf ELSE 0 END) AS DOUBLE)
               / CAST(SUM(tf.tf) AS DOUBLE) AS rare_ratio
      FROM tf JOIN freq USING (token) GROUP BY tf.doc_id
    ), kept AS (
      SELECT d.doc_id, d.source, p.n_tokens
      FROM documents d JOIN per_doc p ON d.doc_id = p.doc_id
      WHERE p.rare_ratio <= 0.35
    ), counts AS (
      SELECT source, COUNT(*) AS n_available FROM kept GROUP BY source
    ), weighted AS (
      SELECT source, n_available, sqrt(CAST(n_available AS DOUBLE)) AS wgt
      FROM counts
    ), runcte AS (
      SELECT source, n_available, wgt,
             SUM(wgt) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM weighted
    ), tot AS (
      SELECT source, n_available, wgt,
             MAX(cum) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS wtot
      FROM runcte
    ), targets AS (
      SELECT source, n_available,
             CAST(FLOOR(150.0 * wgt / wtot) AS BIGINT) AS target_docs
      FROM tot
    ), ranked AS (
      SELECT k.doc_id, k.source, k.n_tokens,
             ROW_NUMBER() OVER (PARTITION BY k.source
                 ORDER BY {_DUCK_PHASH.format(seed=0, v='k.doc_id')}, k.doc_id)
               AS rk
      FROM kept k
    )
    SELECT r.source,
           MAX(t.n_available) AS n_available,
           MAX(t.target_docs) AS target_docs,
           CAST(COUNT(*) AS BIGINT) AS n_selected,
           CAST(SUM(r.n_tokens) AS BIGINT) AS total_tokens
    FROM ranked r JOIN targets t ON r.source = t.source
    WHERE r.rk <= t.target_docs
    GROUP BY r.source ORDER BY r.source
    """,
)
def curation_mix_pipeline_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite curation-v2 pipeline over the round-6 operators:
    unigram-LM rare-token gate (documents whose vocabulary is mostly
    corpus-unique are dropped as gibberish) → temperature mixing
    (alpha = 0.5) of the SURVIVORS into a 150-doc budget → per-source
    doc and token accounting. One oracle row per source pins the whole
    chain: the gate membership, the mix targets, and exactly which
    documents were selected (token totals are content-derived)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.sampling import (
        temperature_mix,
    )

    docs = t(spark, sf_dir, "documents")
    stats = X.token_frequency_stats(docs)
    kept = (
        docs.join(stats.select("doc_id", "n_tokens", "rare_ratio"), "doc_id")
        .filter(F.col("rare_ratio") <= 0.35)
        .select("doc_id", "source", "n_tokens")
    )
    mixed = temperature_mix(kept, "source", "doc_id", budget_docs=150)
    return (
        mixed.groupBy("source")
        .agg(
            F.max("n_available").alias("n_available"),
            F.max("target_docs").alias("target_docs"),
            F.count(F.lit(1)).alias("n_selected"),
            F.sum("n_tokens").alias("total_tokens"),
        )
        .orderBy("source")
    )
