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

The index append and the sink write are NOT atomic across a crash
between them: a batch may be re-processed after its survivors were
indexed, in which case every row of the retry batch self-matches the
index and is dropped — the idempotent outcome a replayed ingest wants
(exactly the semantics tests/test_incremental.py pins for re-runs).
"""

from __future__ import annotations

from typing import Callable, Mapping

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.incremental import (
    incremental_minhash_dedup,
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
    checkpointLocation, batchMaxRetries, ...). On a retried batch the
    already-appended survivors self-match the index, so the retry
    converges to zero new rows instead of double-writing."""

    def process(batch: DataFrame, batch_id: int) -> None:
        survivors = incremental_minhash_dedup(
            batch.sparkSession,
            batch,
            index_path,
            id_col,
            text_col=text_col,
            num_hashes=num_hashes,
            bands=bands,
            n=n,
            verify_threshold=verify_threshold,
        )
        sink(survivors, batch_id)

    return for_each_batch(stream, process, options)
