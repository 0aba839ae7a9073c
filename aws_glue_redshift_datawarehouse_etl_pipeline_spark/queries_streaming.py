"""Oracle-checked Structured Streaming queries.

A streaming windowed aggregation run with ``availableNow`` over the
staged events table must produce exactly the batch answer — so the
DuckDB oracle that checks the batch twin checks the streaming engine
too. This is the strongest correctness statement the driver can record
for streaming: same data, same result, via the incremental stateful
path (/root/reference/awsglue/context.py:553-664 is processing-time
micro-batch only; event-time windows are the engine's documented
extension, SURVEY.md §2.10).
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.queries import query, t
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.streaming.windows import (
    tumbling_window_agg,
)


def _stage_events(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, str]:
    """Stage events (ts already micros) as a directory a file-stream
    source can read; reuse the staging across calls per (session, sf)."""
    ev = t(spark, sf_dir, "events")
    tag = os.path.basename(sf_dir.rstrip("/"))
    stage = os.path.join(tempfile.gettempdir(), f"engine_events_stage_{tag}")
    marker = os.path.join(stage, "_SUCCESS")
    if not os.path.exists(marker):
        ev.write.mode("overwrite").parquet(stage)
    return ev, stage


@query(
    "streaming_hourly_event_counts",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS window_start,
           CAST(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS n
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def streaming_hourly_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows computed by the STREAMING engine
    (readStream → stateful window agg → availableNow → memory sink),
    checked against the batch oracle. Complete output mode: every
    window survives to the final table."""
    ev, stage = _stage_events(spark, sf_dir)
    stream = spark.readStream.schema(ev.schema).parquet(stage)
    agg = tumbling_window_agg(
        stream, "ts", "1 hour", group_cols=["event_type"], aggs=[("count", "*", "n")]
    )
    sink = f"stream_hourly_{uuid.uuid4().hex[:8]}"
    sq = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    sq.awaitTermination()
    return spark.table(sink)
