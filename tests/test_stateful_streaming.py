"""Stateful streaming operators: cross-micro-batch dedup and running
counts via applyInPandasWithState, driven with maxFilesPerTrigger=1 so
state provably survives between micro-batches."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.streaming.stateful import (
    stream_dedup,
    stream_running_counts,
)


@pytest.fixture()
def two_batch_source(spark, tmp_path):
    """Two parquet files → two micro-batches. fp 'a' appears in both."""
    src = str(tmp_path / "src")
    b1 = spark.createDataFrame(
        [(1, "a", "first-a"), (2, "b", "first-b")], "id long, fp string, payload string"
    )
    b2 = spark.createDataFrame(
        [(3, "a", "dup-a"), (4, "c", "first-c")], "id long, fp string, payload string"
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    return stream


def _run_to_memory(df, tmp_path, mode):
    name = f"sink_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return name


def test_stream_dedup_across_batches(spark, two_batch_source, tmp_path):
    sink = _run_to_memory(stream_dedup(two_batch_source, "fp"), tmp_path, "append")
    rows = spark.sql(f"SELECT fp, payload FROM {sink}").collect()
    got = {(r.fp, r.payload) for r in rows}
    # 'a' emitted exactly once (the first occurrence), dup-a dropped
    # even though it arrived in a LATER micro-batch
    assert got == {("a", "first-a"), ("b", "first-b"), ("c", "first-c")}


def test_stream_running_counts_accumulate(spark, two_batch_source, tmp_path):
    sink = _run_to_memory(
        stream_running_counts(two_batch_source, "fp"), tmp_path, "update"
    )
    rows = spark.sql(f"SELECT key, n FROM {sink}").collect()
    # update mode: 'a' appears with n=1 (batch 1) then n=2 (batch 2)
    final = {}
    for r in rows:
        final[r.key] = max(final.get(r.key, 0), r.n)
    assert final == {"a": 2, "b": 1, "c": 1}
