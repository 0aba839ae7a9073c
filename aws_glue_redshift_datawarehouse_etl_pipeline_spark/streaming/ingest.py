"""Streaming ingestion with cross-batch near-dup suppression: the
composition of the micro-batch loop (`microbatch.for_each_batch`) and
the persisted MinHash index (`operators/incremental.py`).

Stateful-streaming dedup (`stateful.stream_dedup`) suppresses repeats
WITHIN the stream's own state; this module suppresses near-duplicates
of everything the pipeline has EVER accepted — the index is durable
parquet, so the suppression survives restarts, is shared across
streams, and is the same artifact batch curation reads and appends.
Each micro-batch pays exactly the incremental-dedup cost: shingle the
batch once, broadcast its band buckets against the index, verify by
hash intersection, append survivors.

Effect ordering is load-bearing: the SINK write runs first, the index
append second. Appending first would mean a failed-and-retried sink
(for_each_batch retries on exception) re-runs the dedup against an
index that already contains this batch — every survivor self-matches
and the retry "succeeds" delivering an EMPTY frame: rows recorded as
accepted but never delivered. With sink-first the crash window between
sink and append instead yields at-least-once delivery (a replayed
batch re-delivers survivors, then the append lands), which downstream
idempotent sinks absorb.
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.dedup import (
    release_caches,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.incremental import (
    incremental_minhash_dedup_plan,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.streaming.microbatch import (
    for_each_batch,
)

__all__ = ["stream_ingest_dedup"]


def stream_ingest_dedup(
    stream: DataFrame,
    index_path: str,
    sink: Callable[[DataFrame, int], None],
    id_col: str,
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    verify_threshold: float = 0.8,
    options: Mapping[str, object] | None = None,
) -> StreamingQuery:
    """Run the streaming ingest loop: per micro-batch, drop rows that
    near-duplicate the indexed corpus (or an earlier row of the same
    batch), hand only the survivors to ``sink(batch_df, batch_id)``,
    and append their index rows for every later batch and stream.

    ``options`` pass through to ``for_each_batch`` (windowSize,
    checkpointLocation, batchMaxRetries, ...). The sink runs BEFORE
    the index append (see module docstring), so a retried batch
    re-delivers its survivors (at-least-once) rather than silently
    delivering nothing; the per-batch feature cache is released after
    both effects so a long-running stream pins no storage."""

    def process(batch: DataFrame, batch_id: int) -> None:
        registry: list[DataFrame] = []
        try:
            survivors, surv_index = incremental_minhash_dedup_plan(
                batch.sparkSession,
                batch,
                index_path,
                id_col,
                text_col=text_col,
                num_hashes=num_hashes,
                bands=bands,
                n=n,
                verify_threshold=verify_threshold,
                cache_registry=registry,
            )
            sink(survivors, batch_id)
            surv_index.write.mode("append").parquet(index_path)
        finally:
            release_caches(registry)

    return for_each_batch(stream, process, options)
