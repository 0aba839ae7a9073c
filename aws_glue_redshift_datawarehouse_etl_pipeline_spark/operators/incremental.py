"""Incremental near-dup: dedup a new batch against a persisted MinHash
index WITHOUT touching the already-indexed corpus.

The batch pipeline (`minhash_lsh_dedup`) re-shingles the whole corpus
every run — right for one-shot curation, wrong for continuous
ingestion where yesterday's 100 TB is already clean and only today's
slice is new. The index stores, per document, everything dedup ever
needs again:

  (doc, sig array<long>, shingles array<long>, n_sh int)

- ``sig``: the xxhash64 MinHash signature → band buckets for candidate
  generation (the only thing that gets joined at scale).
- ``shingles``: the document's distinct 64-bit shingle hashes → exact
  Jaccard verification by array intersection, so verification never
  needs the original text either.

Per new batch the cost is: one narrow pass over the BATCH (shingle +
sign), a band join of batch buckets against index buckets (shuffle is
O(batch + colliding index postings), never O(index) — the band-bucket
key prunes index-side rows before they move), intra-batch LSH, exact
verification on candidates only, and an append of survivors to the
index. The index lives as plain parquet: the join key is
(band, bucket) and the batch-side bucket set broadcast prunes the
index before any shuffle; co-bucketed layout (sources/bucketed.py)
is the documented upgrade when one band join dominates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
    word_ngram_hashes,
)

__all__ = [
    "build_minhash_index",
    "write_minhash_index",
    "incremental_minhash_dedup",
    "incremental_minhash_dedup_plan",
]


def _sig_and_shingles(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int, n: int
) -> DataFrame:
    """(doc, sig, shingles, n_sh) in ONE pass over the text: signatures
    are min-aggregates over the exploded shingle hashes, and the
    shingle array itself rides along via collect_set (same exploded
    rows, same single shuffle).

    Documents with fewer than ``n`` tokens have no n-gram shingles and
    would otherwise be invisible to the index — never matched, never
    indexed, re-admitted on every replay. They fall back to a single
    whole-text hash: exact re-submissions then match with Jaccard 1
    and are deduplicated like everything else."""
    grams = word_ngram_hashes(F.col(text_col), n)
    shingle_set = F.when(F.size(grams) > 0, grams).otherwise(
        F.array(F.xxhash64(F.col(text_col)))
    )
    ex = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingle_set).alias("s"),
    )
    aggs = [
        F.min(F.xxhash64(F.lit(i), F.col("s"))).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    return (
        ex.groupBy("doc")
        .agg(*aggs, F.collect_set("s").alias("shingles"))
        .select(
            "doc",
            F.array(*[F.col(f"__h{i}") for i in range(num_hashes)]).alias("sig"),
            "shingles",
            F.size("shingles").alias("n_sh"),
        )
    )


def build_minhash_index(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    n: int = 3,
) -> DataFrame:
    """Index frame for a (already deduplicated) corpus. Write it with
    ``write_minhash_index`` and hand the path to every subsequent
    ``incremental_minhash_dedup`` call."""
    return _sig_and_shingles(df, id_col, text_col, num_hashes, n)


def write_minhash_index(index: DataFrame, path: str, mode: str = "overwrite") -> None:
    index.write.mode(mode).parquet(path)


def _banded(sig_df: DataFrame, bands: int, rows: int) -> DataFrame:
    return sig_df.select(
        "doc",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice("sig", b * rows + 1, rows),
                            lambda x: x.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )


def incremental_minhash_dedup_plan(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    verify_threshold: float = 0.8,
    cache_registry: list[DataFrame] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build the incremental-dedup plan WITHOUT writing anything:
    returns ``(survivors, survivor_index_rows)``. Callers that must
    order the index append relative to another effect (a sink write, a
    transactional commit) run their effect FIRST and then append
    ``survivor_index_rows`` — appending before the effect means a
    failed-and-retried effect re-reads an index that already contains
    this batch, every survivor self-matches, and the retry silently
    delivers nothing (streaming/ingest.py relies on this ordering).

    Intra-batch policy matches ``minhash_lsh_dedup`` (drop the larger
    id of each verified pair); batch-vs-index always drops the batch
    side (the corpus is immutable — re-curating it is a batch job, not
    an ingest step).

    The batch feature frame is persisted (it feeds candidate
    generation, both verifications, and the index append); pass
    ``cache_registry`` and call ``release_caches`` after the final
    action on the returned frames.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    rows = num_hashes // bands
    feats = _sig_and_shingles(batch, id_col, text_col, num_hashes, n).persist()
    if cache_registry is not None:
        cache_registry.append(feats)
    index = spark.read.parquet(index_path)
    # config drift turns into silent recall loss: a stored sig shorter
    # than num_hashes makes the trailing bands hash an empty slice on
    # the index side only, so those bands can never collide. A single
    # sampled row would miss MIXED lengths (rows appended under a
    # different num_hashes), so check min AND max in one aggregate and
    # fail loudly on any mismatch.
    rng = index.agg(
        F.min(F.size("sig")).alias("lo"), F.max(F.size("sig")).alias("hi")
    ).first()
    if rng["lo"] is not None and not (rng["lo"] == rng["hi"] == num_hashes):
        raise ValueError(
            f"index at {index_path} stores signatures of length "
            f"[{rng['lo']}, {rng['hi']}] but num_hashes={num_hashes} was "
            "requested; rebuild the index or match its configuration"
        )

    b_band = _banded(feats, bands, rows)
    i_band = _banded(index, bands, rows)
    # batch bucket set is small: broadcast-semi-join prunes the index
    # postings map-side, so only colliding index rows ever shuffle
    hit_buckets = b_band.select("band", "bucket").distinct()
    i_hits = i_band.join(F.broadcast(hit_buckets), ["band", "bucket"], "left_semi")

    cross_cand = (
        b_band.alias("b")
        .join(
            i_hits.alias("i"),
            (F.col("b.band") == F.col("i.band"))
            & (F.col("b.bucket") == F.col("i.bucket")),
        )
        .select(F.col("b.doc").alias("doc_b"), F.col("i.doc").alias("doc_i"))
        .distinct()
    )
    cross_bad = (
        cross_cand.join(
            feats.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sb"),
                         F.col("n_sh").alias("nb")),
            "doc_b",
        )
        .join(
            index.select(F.col("doc").alias("doc_i"), F.col("shingles").alias("si"),
                         F.col("n_sh").alias("ni")),
            "doc_i",
        )
        .withColumn("__c", F.size(F.array_intersect("sb", "si")))
        .withColumn(
            "__j",
            F.col("__c").cast("double")
            / (F.col("nb") + F.col("ni") - F.col("__c")).cast("double"),
        )
        .filter(F.col("__j") >= verify_threshold)
        .select(F.col("doc_b").alias("doc"))
        .distinct()
    )

    a, b = b_band.alias("a"), b_band.alias("b")
    intra_cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )
    fa = feats.select(F.col("doc").alias("doc_a"), F.col("shingles").alias("sa"),
                      F.col("n_sh").alias("na"))
    fb = feats.select(F.col("doc").alias("doc_b"), F.col("shingles").alias("sb"),
                      F.col("n_sh").alias("nb"))
    intra_bad = (
        intra_cand.join(fa, "doc_a")
        .join(fb, "doc_b")
        .withColumn("__c", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "__j",
            F.col("__c").cast("double")
            / (F.col("na") + F.col("nb") - F.col("__c")).cast("double"),
        )
        .filter(F.col("__j") >= verify_threshold)
        .select(F.col("doc_b").alias("doc"))
        .distinct()
    )

    losers = cross_bad.union(intra_bad).distinct()
    survivors = batch.join(
        losers.withColumnRenamed("doc", id_col), id_col, "left_anti"
    )
    surv_index = feats.join(losers, feats.doc == losers.doc, "left_anti")
    return survivors, surv_index


def incremental_minhash_dedup(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    verify_threshold: float = 0.8,
    append_survivors: bool = True,
    cache_registry: list[DataFrame] | None = None,
) -> DataFrame:
    """Return the rows of ``batch`` that are near-duplicates of neither
    the indexed corpus nor an earlier-id row of the batch itself; by
    default the survivors' index rows are appended to ``index_path`` so
    the next batch sees them. When another effect must land between
    dedup and append (a sink write), use
    ``incremental_minhash_dedup_plan`` and append afterwards.

    The append writes into the directory the plan reads, but every
    plan hangs off one ``spark.read.parquet`` whose file listing was
    snapshot eagerly — later actions on the returned frame keep seeing
    the pre-append index. (Do NOT persist the loser set to "freeze" it
    instead: the append's refreshByPath invalidates caches over
    index_path and the recompute would re-list, seeing the batch's own
    rows.)"""
    survivors, surv_index = incremental_minhash_dedup_plan(
        spark,
        batch,
        index_path,
        id_col,
        text_col=text_col,
        num_hashes=num_hashes,
        bands=bands,
        n=n,
        verify_threshold=verify_threshold,
        cache_registry=cache_registry,
    )
    if append_survivors:
        surv_index.write.mode("append").parquet(index_path)
    return survivors
