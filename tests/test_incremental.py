"""Incremental MinHash-index dedup: new batches dedup against the
persisted index without re-shingling the corpus, and survivors extend
the index for the next batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.incremental import (
    build_minhash_index,
    incremental_minhash_dedup,
    write_minhash_index,
)

_BASE = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (2, "completely different text about spark partitions and shuffle behavior today"),
    (3, "a third document describing parquet row groups and min max statistics"),
]


@pytest.fixture()
def corpus_index(spark, tmp_path):
    corpus = spark.createDataFrame(_BASE, "doc_id long, text string")
    path = str(tmp_path / "mh_index")
    write_minhash_index(build_minhash_index(corpus, "doc_id"), path)
    return corpus, path


def test_index_schema_and_one_row_per_doc(spark, corpus_index):
    _, path = corpus_index
    idx = spark.read.parquet(path)
    assert set(idx.columns) == {"doc", "sig", "shingles", "n_sh"}
    assert idx.count() == 3
    r = idx.filter(F.col("doc") == 1).first()
    assert len(r["sig"]) == 16 and r["n_sh"] == len(set(r["shingles"]))


def test_batch_dups_of_corpus_are_dropped(spark, corpus_index, tmp_path):
    _, path = corpus_index
    batch = spark.createDataFrame(
        [
            # near-exact copy of doc 1 (one word changed at the end)
            (10, "the quick brown fox jumps over the lazy dog and runs far away now"),
            # genuinely new
            (11, "brand new content mentioning streaming watermarks and state stores"),
        ],
        "doc_id long, text string",
    )
    surv = incremental_minhash_dedup(spark, batch, path, "doc_id")
    assert [r.doc_id for r in surv.collect()] == [11]
    # survivor was appended: next identical batch row is now a dup
    again = spark.createDataFrame(
        [(20, "brand new content mentioning streaming watermarks and state stores")],
        "doc_id long, text string",
    )
    surv2 = incremental_minhash_dedup(spark, again, path, "doc_id")
    assert surv2.count() == 0


def test_intra_batch_dups_keep_smallest_id(spark, corpus_index):
    _, path = corpus_index
    batch = spark.createDataFrame(
        [
            (31, "two copies of this fresh sentence about adaptive query execution plans"),
            (30, "two copies of this fresh sentence about adaptive query execution plans"),
            (32, "an unrelated survivor row describing broadcast hash join thresholds"),
        ],
        "doc_id long, text string",
    )
    surv = incremental_minhash_dedup(
        spark, batch, path, "doc_id", append_survivors=False
    )
    assert sorted(r.doc_id for r in surv.collect()) == [30, 32]


def test_no_append_leaves_index_unchanged(spark, corpus_index):
    _, path = corpus_index
    before = spark.read.parquet(path).count()
    batch = spark.createDataFrame(
        [(40, "yet another totally novel document about executor memory overheads")],
        "doc_id long, text string",
    )
    surv = incremental_minhash_dedup(
        spark, batch, path, "doc_id", append_survivors=False
    )
    assert surv.count() == 1
    assert spark.read.parquet(path).count() == before


def test_rejects_bad_band_split(spark, corpus_index):
    corpus, path = corpus_index
    with pytest.raises(ValueError):
        incremental_minhash_dedup(spark, corpus, path, "doc_id", num_hashes=16, bands=5)


def test_index_config_mismatch_raises(spark, corpus_index):
    _, path = corpus_index
    batch = spark.createDataFrame(
        [(50, "some text that is long enough to have several shingles here")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="signatures of length"):
        incremental_minhash_dedup(spark, batch, path, "doc_id", num_hashes=32, bands=4)


def test_short_docs_are_indexed_and_deduped(spark, corpus_index):
    """Sub-n-token documents fall back to a whole-text hash: the first
    submission survives and is indexed, an exact re-submission is
    dropped — not re-admitted forever."""
    _, path = corpus_index
    first = spark.createDataFrame([(60, "ok")], "doc_id long, text string")
    assert incremental_minhash_dedup(spark, first, path, "doc_id").count() == 1
    replay = spark.createDataFrame([(61, "ok")], "doc_id long, text string")
    assert incremental_minhash_dedup(spark, replay, path, "doc_id").count() == 0


def test_plan_variant_defers_append(spark, corpus_index):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.incremental import (
        incremental_minhash_dedup_plan,
    )

    _, path = corpus_index
    before = spark.read.parquet(path).count()
    batch = spark.createDataFrame(
        [(70, "a wholly new sentence about vectorized parquet readers and filters")],
        "doc_id long, text string",
    )
    survivors, surv_index = incremental_minhash_dedup_plan(spark, batch, path, "doc_id")
    assert survivors.count() == 1
    # nothing written until the caller appends
    assert spark.read.parquet(path).count() == before
    surv_index.write.mode("append").parquet(path)
    assert spark.read.parquet(path).count() == before + 1


def test_incremental_plan_prunes_index_with_broadcast_semi_join(spark, corpus_index):
    """The batch-vs-index candidate join must prune index postings with
    a broadcast semi-join BEFORE any shuffle — an index-sized exchange
    here would be O(corpus) per micro-batch."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.incremental import (
        incremental_minhash_dedup_plan,
    )

    _, path = corpus_index
    batch = spark.createDataFrame(
        [(80, "a fresh probe sentence about broadcast pruning of index postings")],
        "doc_id long, text string",
    )
    survivors, _ = incremental_minhash_dedup_plan(spark, batch, path, "doc_id")
    plan = survivors._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_index_mixed_signature_lengths_detected(spark, corpus_index, tmp_path):
    """An index appended under two different num_hashes configs has
    rows whose trailing bands can never collide; the min/max aggregate
    must catch it even when the FIRST row looks right."""
    _, path = corpus_index
    idx = spark.read.parquet(path)
    short = idx.limit(1).withColumn("sig", F.slice("sig", 1, 8))
    idx.unionByName(short).write.mode("overwrite").parquet(str(tmp_path / "mixed"))
    batch = spark.createDataFrame(
        [(50, "some text that is long enough to have several shingles here")],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="signatures of length"):
        incremental_minhash_dedup(
            spark, batch, str(tmp_path / "mixed"), "doc_id", num_hashes=16, bands=4
        )
