from aws_glue_redshift_datawarehouse_etl_pipeline_spark.streaming.ingest import (
    stream_ingest_dedup,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.streaming.microbatch import (
    for_each_batch,
    parse_window_size,
    sample_streaming_frame,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.streaming.stateful import (
    stream_dedup,
    stream_running_counts,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.streaming.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "for_each_batch",
    "stream_ingest_dedup",
    "parse_window_size",
    "sample_streaming_frame",
    "stream_dedup",
    "stream_running_counts",
    "session_window_agg",
    "sliding_window_agg",
    "tumbling_window_agg",
]
