"""EngineFrame: a DataFrame plus an error-record side channel.

Rebuilds the reference's DynamicFrame error semantics
(/root/reference/awsglue/dynamicframe.py:80-124) on the DataFrame API:

- ``filter(f)``: a row for which ``f`` raises KeyError/ValueError/
  TypeError is **silently dropped**; any other exception keeps the row
  flagged as an error (:85-90).
- ``map(f)``: an exception or a ``None`` return marks the record as an
  error (original record preserved with the message) (:106-115).
- ``errors_frame()`` / ``errors_count()`` expose the channel;
  ``assert_error_threshold()`` enforces stage/total thresholds
  (:493-519).

Row callbacks are the slow path (Arrow-batched ``mapInPandas``, one
Python round trip); every built-in operator of the engine works on
Column expressions and never pays it. The error channel itself is lazy
— counting errors is the only action it triggers.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_DROP_EXCS = (KeyError, ValueError, TypeError)

ERROR_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("error_message", T.StringType(), True),
        T.StructField("record", T.StringType(), True),
    ]
)


def _record_json(row: dict) -> str:
    return json.dumps(row, default=str, sort_keys=True)


class EngineFrame:
    """(data, errors) pair with DynamicFrame-style row callbacks."""

    def __init__(self, df: DataFrame, errors: DataFrame | None = None, name: str = "frame"):
        self.df = df
        self.name = name
        self._errors = errors

    # -- plumbing -------------------------------------------------------

    @property
    def spark(self) -> SparkSession:
        return self.df.sparkSession

    def _empty_errors(self) -> DataFrame:
        return self.spark.createDataFrame([], ERROR_SCHEMA)

    def errors_frame(self) -> DataFrame:
        """errorsAsDynamicFrame (/root/reference/awsglue/transforms/
        errors_as_dynamicframe.py:15-45)."""
        return self._errors if self._errors is not None else self._empty_errors()

    def errors_count(self) -> int:
        return self.errors_frame().count() if self._errors is not None else 0

    def with_errors(self, more: DataFrame) -> "EngineFrame":
        base = self._errors
        merged = more if base is None else base.unionByName(more)
        return EngineFrame(self.df, merged, self.name)

    def assert_error_threshold(self, total_threshold: int = 0) -> "EngineFrame":
        """Fail the job when accumulated error records exceed the
        threshold (/root/reference/awsglue/dynamicframe.py:514-519)."""
        n = self.errors_count()
        if n > total_threshold:
            raise RuntimeError(
                f"{self.name}: {n} error records exceed totalThreshold={total_threshold}"
            )
        return self

    # -- row callbacks --------------------------------------------------

    def filter(
        self,
        f: Callable[[dict], bool],
        transformation_ctx: str = "filter",
        stage_threshold: int = 0,
    ) -> "EngineFrame":
        """Python row-predicate filter with the reference's exception
        semantics. Prefer Column predicates (`df.filter(col)`) —
        this path exists for API parity and genuinely dynamic records."""
        in_schema = self.df.schema
        out_schema = T.StructType(
            in_schema.fields + [T.StructField("__error__", T.StringType(), True)]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                keep_rows = []
                for row in pdf.to_dict("records"):
                    try:
                        if f(dict(row)):
                            keep_rows.append({**row, "__error__": None})
                    except _DROP_EXCS:
                        continue  # silently dropped (:85-88)
                    except Exception as exc:  # kept + flagged (:89-90)
                        keep_rows.append({**row, "__error__": repr(exc)})
                yield pd.DataFrame(keep_rows, columns=[c.name for c in out_schema])

        enveloped = self.df.mapInPandas(run, out_schema)
        # flagged rows stay in the main stream (reference :89-90 keeps
        # them); the error channel carries a copy
        data = enveloped.drop("__error__")
        errs = (
            enveloped.filter(F.col("__error__").isNotNull())
            .select(
                F.lit(transformation_ctx).alias("stage"),
                F.col("__error__").alias("error_message"),
                F.to_json(F.struct(*[F.col(c) for c in self.df.columns])).alias("record"),
            )
        )
        out = EngineFrame(data, self._errors, self.name).with_errors(errs)
        if stage_threshold:
            n = errs.count()
            if n > stage_threshold:
                raise RuntimeError(
                    f"{transformation_ctx}: {n} errors exceed stageThreshold={stage_threshold}"
                )
        return out

    def map(
        self,
        f: Callable[[dict], dict | None],
        output_schema: T.StructType | str,
        transformation_ctx: str = "map",
        stage_threshold: int = 0,
    ) -> "EngineFrame":
        """Per-record transform; errors/None returns land in the error
        channel with the original record (:106-115)."""
        if isinstance(output_schema, str):
            output_schema = T.StructType.fromDDL(output_schema)
        env_schema = T.StructType(
            list(output_schema.fields)
            + [
                T.StructField("__error__", T.StringType(), True),
                T.StructField("__record__", T.StringType(), True),
            ]
        )
        out_cols = [c.name for c in output_schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for row in pdf.to_dict("records"):
                    try:
                        y = f(dict(row))
                        if y is None:
                            raise ValueError("map function returned None")
                        rows.append(
                            {**{c: y.get(c) for c in out_cols}, "__error__": None, "__record__": None}
                        )
                    except Exception as exc:
                        rows.append(
                            {
                                **{c: None for c in out_cols},
                                "__error__": repr(exc),
                                "__record__": _record_json(row),
                            }
                        )
                yield pd.DataFrame(rows, columns=[c.name for c in env_schema])

        enveloped = self.df.mapInPandas(run, env_schema)
        data = enveloped.filter(F.col("__error__").isNull()).select(*out_cols)
        errs = enveloped.filter(F.col("__error__").isNotNull()).select(
            F.lit(transformation_ctx).alias("stage"),
            F.col("__error__").alias("error_message"),
            F.col("__record__").alias("record"),
        )
        out = EngineFrame(data, self._errors, self.name).with_errors(errs)
        if stage_threshold:
            n = errs.count()
            if n > stage_threshold:
                raise RuntimeError(
                    f"{transformation_ctx}: {n} errors exceed stageThreshold={stage_threshold}"
                )
        return out


    # -- partition-level callbacks --------------------------------------

    def map_partitions(
        self,
        f: Callable[[Iterator[dict]], Iterator[dict]],
        output_schema: T.StructType | str,
    ) -> "EngineFrame":
        """Partition-level Python function (mapPartitions,
        /root/reference/awsglue/dynamicframe.py:96-124). The reference
        round-trips through a Python RDD; here the partition stays on
        the Arrow path — ``mapInPandas`` hands each partition to ``f``
        as an iterator of dicts and rebuilds Arrow batches from the
        yielded records. No error channel: exceptions in ``f`` fail the
        stage, matching the reference (only map/filter wrap errors)."""
        if isinstance(output_schema, str):
            output_schema = T.StructType.fromDDL(output_schema)
        out_cols = [c.name for c in output_schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            def rows() -> Iterator[dict]:
                for pdf in batches:
                    yield from pdf.to_dict("records")

            out = list(f(rows()))
            yield pd.DataFrame(out, columns=out_cols)

        return EngineFrame(
            self.df.mapInPandas(run, output_schema), self._errors, self.name
        )

    def map_partitions_with_index(
        self,
        f: Callable[[int, Iterator[dict]], Iterator[dict]],
        output_schema: T.StructType | str,
    ) -> "EngineFrame":
        """mapPartitionsWithIndex (/root/reference/awsglue/
        dynamicframe.py:96-99): ``f(partition_index, records)``. The
        index comes from ``TaskContext.partitionId()`` so the data still
        moves as Arrow batches instead of pickled rows."""
        from pyspark import TaskContext

        def indexed(rows: Iterator[dict]) -> Iterator[dict]:
            ctx = TaskContext.get()
            pid = ctx.partitionId() if ctx is not None else 0
            yield from f(pid, rows)

        return self.map_partitions(indexed, output_schema)


class FrameCollection:
    """Named dict of frames — output shape of split_fields/split_rows/
    relationalize (/root/reference/awsglue/dynamicframe.py:522-593).
    A missing key selects an empty frame (:553-556)."""

    def __init__(self, frames: dict[str, DataFrame]):
        self._frames = dict(frames)

    def keys(self):
        return self._frames.keys()

    def __getitem__(self, name: str) -> DataFrame:
        return self._frames[name]

    def select(self, name: str) -> DataFrame:
        if name in self._frames:
            return self._frames[name]
        any_df = next(iter(self._frames.values()))
        return any_df.sparkSession.createDataFrame([], T.StructType([]))

    def map_frames(self, fn: Callable[[DataFrame, str], DataFrame]) -> "FrameCollection":
        return FrameCollection({k: fn(df, k) for k, df in self._frames.items()})

    def flatmap(self, fn: Callable[[DataFrame, str], dict[str, DataFrame]]) -> "FrameCollection":
        out: dict[str, DataFrame] = {}
        for k, df in self._frames.items():
            out.update(fn(df, k))
        return FrameCollection(out)
