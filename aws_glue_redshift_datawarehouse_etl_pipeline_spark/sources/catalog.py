"""WarehouseCatalog: the engine's warehouse tables + job bookmarks.

Stands in for the reference's Redshift target + Glue catalog
(/root/reference/awsglue/context.py:158-220, :407-436): tables are
directories of parquet under a root, with declared sort keys driving
physical layout the way the DDL's SORTKEY does
(/root/reference/redshift/ddl.sql:8) — ``repartitionByRange`` on the
sort key then ``sortWithinPartitions``, so range scans on the key prune
files and stay sequential. Bookmarks are per-source high-watermarks
(Job.init/commit, /root/reference/awsglue/job.py:37-48) stored in a
JSON sidecar.

At cluster scale the same layout maps to saveAsTable with bucketing, or
a lakehouse table format; the catalog API is the seam where that swaps
in.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class WarehouseCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def table_exists(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith("part-") for f in os.listdir(p)
        )

    def read_table(self, table: str) -> DataFrame:
        """Read with the commit-marker guard: a table stranded mid-merge
        or mid-compaction by a crashed writer is healed to its
        pre-operation snapshot before the scan, so partial state is
        never silently read (two existence checks when clean)."""
        from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.maintenance import (
            ensure_recovered,
        )

        path = self._path(table)
        ensure_recovered(self.spark, path)
        return self.spark.read.parquet(path)

    def get_table_schema(self, table: str):
        """Declared schema lookup (get_catalog_schema_as_spark_schema,
        /root/reference/awsglue/context.py:149-150): read from the
        parquet footers — a metadata-only operation, no data scan."""
        return self.read_table(table).schema

    def write_table(
        self,
        df: DataFrame,
        table: str,
        mode: str = "append",
        sort_keys: Sequence[str] | None = None,
        target_partitions: int | None = None,
    ) -> None:
        """Append/overwrite with SORTKEY-style layout: range-partition
        on the sort key so each output file covers a disjoint key range
        (file-level min/max pruning on later scans), sorted within."""
        if sort_keys:
            n = target_partitions or df.sparkSession.sparkContext.defaultParallelism
            df = df.repartitionByRange(n, *sort_keys).sortWithinPartitions(*sort_keys)
        elif target_partitions:
            df = df.repartition(target_partitions)
        df.write.mode(mode).parquet(self._path(table))

    # -- job bookmarks (high-watermark incremental reads) ---------------

    @property
    def _bookmark_file(self) -> str:
        return os.path.join(self.root, "_bookmarks.json")

    def _load_bookmarks(self) -> dict:
        if os.path.exists(self._bookmark_file):
            with open(self._bookmark_file) as fh:
                return json.load(fh)
        return {}

    def get_bookmark(self, source: str):
        return self._load_bookmarks().get(source)

    def commit_bookmark(self, source: str, df: DataFrame, watermark_col: str) -> None:
        """Record the max watermark seen — subsequent incremental reads
        filter rows beyond it (Job.commit checkpoint semantics)."""
        row = df.agg(F.max(watermark_col).alias("wm")).first()
        if row and row.wm is not None:
            marks = self._load_bookmarks()
            marks[source] = str(row.wm)
            with open(self._bookmark_file, "w") as fh:
                json.dump(marks, fh)

    def incremental_read(self, df: DataFrame, source: str, watermark_col: str) -> DataFrame:
        wm = self.get_bookmark(source)
        if wm is None:
            return df
        return df.filter(F.col(watermark_col) > F.lit(wm))
