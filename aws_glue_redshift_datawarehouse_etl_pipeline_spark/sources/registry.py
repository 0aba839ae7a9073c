"""Source/sink dispatch — the engine's version of the reference's
connection_type/format routing (/root/reference/awsglue/context.py:86-120,
:313-354). Everything funnels into ``spark.read``/``df.write`` so the
vectorized parquet/orc readers, predicate pushdown, and partition
pruning are always in play (the reference routes parquet/orc to Spark
SQL sources for the same reason, context.py:53,:101-102).
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession

_FILE_FORMATS = {"csv", "tsv", "json", "parquet", "orc", "avro", "text"}


def read_tsv(
    spark: SparkSession, path: str, names: Sequence[str] | None = None
) -> DataFrame:
    """Headerless tab-separated read, all columns string — the
    reference's input reader (/root/reference/pipeline.py:43-44). With
    ``names``, columns are assigned positionally (the engine's
    replacement for the fragile rename loop at pipeline.py:89-91)."""
    df = spark.read.option("sep", "\t").csv(path)
    if names is not None:
        from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.field_ops import (
            positional_rename,
        )

        df = positional_rename(df, names)
    return df


def read_source(
    spark: SparkSession,
    connection_type: str,
    options: Mapping[str, Any] | None = None,
    fmt: str | None = None,
    format_options: Mapping[str, Any] | None = None,
    push_down_predicate: str | None = None,
    schema=None,
    min_partitions: int | None = None,
) -> DataFrame:
    """Options-based source factory (create_dynamic_frame.from_options,
    /root/reference/awsglue/context.py:222-237).

    ``connection_type``: file/s3 path sources (parquet/csv/...), or
    ``jdbc``. ``push_down_predicate`` becomes a ``where`` before any
    action so Catalyst prunes partitions/row groups at the scan.
    """
    options = dict(options or {})
    format_options = dict(format_options or {})
    if connection_type in ("file", "s3", "path"):
        path = options.pop("path", None) or options.pop("paths", None)
        if path is None:
            raise ValueError("file source requires 'path' in options")
        if isinstance(path, (list, tuple)):
            paths = list(path)
        else:
            paths = [path]
        fmt = (fmt or "parquet").lower()
        if fmt == "tsv":
            fmt, format_options = "csv", {"sep": "\t", **format_options}
        if fmt not in _FILE_FORMATS:
            raise ValueError(f"unsupported file format {fmt!r}")
        reader = spark.read.format(fmt).options(**{**options, **format_options})
        if schema is not None:
            reader = reader.schema(schema)
        df = reader.load(paths)
    elif connection_type == "jdbc":
        required = {"url", "dbtable"}
        missing = required - set(options)
        if missing:
            raise ValueError(f"jdbc source missing options: {sorted(missing)}")
        df = spark.read.format("jdbc").options(**options).load()
    else:
        raise ValueError(f"unsupported connection_type {connection_type!r}")
    if push_down_predicate:
        df = df.where(push_down_predicate)
    if min_partitions and df.rdd.getNumPartitions() < min_partitions:
        df = df.repartition(min_partitions)
    return df


def write_sink(
    df: DataFrame,
    connection_type: str,
    options: Mapping[str, Any] | None = None,
    fmt: str | None = None,
    mode: str = "append",
    partition_by: Sequence[str] | None = None,
) -> None:
    """Options-based sink (write_dynamic_frame.from_options,
    /root/reference/awsglue/context.py:313-354). File sinks write
    partitioned columnar data; jdbc appends batched inserts (the
    COPY-staging strategy of the reference's Redshift sink,
    context.py:407-436, is a connector concern documented in
    sources/catalog.py)."""
    options = dict(options or {})
    if connection_type in ("file", "s3", "path"):
        path = options.pop("path", None)
        if path is None:
            raise ValueError("file sink requires 'path' in options")
        fmt = (fmt or "parquet").lower()
        writer = df.write.format(fmt).options(**options).mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
    elif connection_type == "jdbc":
        df.write.format("jdbc").options(**options).mode(mode).save()
    else:
        raise ValueError(f"unsupported connection_type {connection_type!r}")


def write_frame(
    frame,
    connection_type: str,
    options: Mapping[str, Any] | None = None,
    fmt: str | None = None,
    mode: str = "append",
    partition_by: Sequence[str] | None = None,
) -> DataFrame:
    """Sink an EngineFrame and hand back its error companion — the
    reference's DataSink.writeFrame returns ``name + "_errors"``
    (/root/reference/awsglue/data_sink.py:31-49). The data side goes
    through write_sink; the caller inspects/persists the returned
    errors frame (usually asserting it's empty via
    ``assert_error_threshold`` first)."""
    write_sink(frame.df, connection_type, options, fmt, mode, partition_by)
    return frame.errors_frame()


def spigot(df: DataFrame, path: str, topk: int | None = 100, prob: float | None = None) -> DataFrame:
    """Tee a sample of records to a JSON path and pass the frame
    through unchanged (/root/reference/awsglue/transforms/
    field_transforms.py:431-469)."""
    sample = df.sample(prob) if prob is not None else df.limit(topk or 100)
    sample.write.mode("overwrite").json(path)
    return df
