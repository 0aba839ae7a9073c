"""Micro-batch streaming loop — the reference's forEachBatch semantics
(/root/reference/awsglue/context.py:553-664) on Structured Streaming.

Faithful behaviors:
- windowSize grammar ``"N seconds|minutes|hours"`` (:562-581), polling
  interval must be ≥ the window (:583-585);
- per-batch persist → count → user function → unpersist (:628-638);
- batch retry with linear backoff up to ``batchMaxRetries`` ∈ [0,100]
  (default 3), retry counter resets after a success (:616-664);
- bounded in-memory sampling of a stream (:553-599).
"""

from __future__ import annotations

import re
import time
from typing import Callable, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery
from pyspark.storagelevel import StorageLevel

_WINDOW_RE = re.compile(r"^\s*(\d+)\s*(second|minute|hour)s?\s*$", re.IGNORECASE)
_UNIT_MS = {"second": 1_000, "minute": 60_000, "hour": 3_600_000}


def parse_window_size(window_size: str) -> int:
    """``"100 seconds"`` → 100000 ms (context.py:562-581 grammar)."""
    m = _WINDOW_RE.match(window_size)
    if not m:
        raise ValueError(
            f"invalid windowSize {window_size!r}: expected 'N seconds|minutes|hours'"
        )
    return int(m.group(1)) * _UNIT_MS[m.group(2).lower()]


def for_each_batch(
    frame: DataFrame,
    batch_function: Callable[[DataFrame, int], None],
    options: Mapping[str, object] | None = None,
) -> StreamingQuery:
    """Run a micro-batch loop over a streaming DataFrame.

    Options (mirroring context.py:602-664): ``windowSize`` (trigger
    interval string, default "10 seconds"), ``checkpointLocation``,
    ``batchMaxRetries`` (0-100, default 3), ``persistDataFrame``
    (default true), ``storageLevel`` (default MEMORY_AND_DISK). The
    returned query is started; callers drive it (processAllAvailable /
    awaitTermination) and stop it.
    """
    opts = dict(options or {})
    window_ms = parse_window_size(str(opts.get("windowSize", "10 seconds")))
    max_retries = int(opts.get("batchMaxRetries", 3))
    if not 0 <= max_retries <= 100:
        raise ValueError("batchMaxRetries must be within [0, 100]")
    persist = str(opts.get("persistDataFrame", "true")).lower() == "true"
    level_name = str(opts.get("storageLevel", "MEMORY_AND_DISK"))
    storage_level = getattr(StorageLevel, level_name)
    retry_state = {"attempts": 0}

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        if persist:
            batch_df.persist(storage_level)
        try:
            while True:
                try:
                    batch_df.count()  # materialize once under the cache
                    batch_function(batch_df, batch_id)
                    retry_state["attempts"] = 0  # reset on success (:619-623)
                    return
                except Exception:
                    retry_state["attempts"] += 1
                    if retry_state["attempts"] > max_retries:
                        raise
                    # linear backoff like the reference (:647-664)
                    time.sleep(min(0.1 * retry_state["attempts"], 5.0))
        finally:
            if persist:
                batch_df.unpersist()

    writer = (
        frame.writeStream.foreachBatch(run_batch)
        .trigger(processingTime=f"{window_ms} milliseconds")
    )
    checkpoint = opts.get("checkpointLocation")
    if checkpoint:
        writer = writer.option("checkpointLocation", str(checkpoint))
    return writer.start()


def sample_streaming_frame(
    spark: SparkSession,
    frame: DataFrame,
    options: Mapping[str, object] | None = None,
) -> DataFrame:
    """Materialize a bounded sample of a stream through an in-memory
    table (getSampleStreamingDynamicFrame, context.py:553-599)."""
    opts = dict(options or {})
    window_ms = parse_window_size(str(opts.get("windowSize", "10 seconds")))
    polling_ms = int(opts.get("pollingTimeInMs", 10_000))
    limit = int(opts.get("recordPollingLimit", 100))
    if polling_ms < window_ms:
        raise ValueError("pollingTimeInMs must be >= windowSize (context.py:583-585)")
    name = f"engine_stream_sample_{int(time.time() * 1000)}"
    q = (
        frame.writeStream.format("memory")
        .queryName(name)
        .trigger(processingTime=f"{window_ms} milliseconds")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name} LIMIT {limit}")
