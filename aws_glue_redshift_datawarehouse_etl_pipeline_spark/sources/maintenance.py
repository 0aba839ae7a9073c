"""Table/path maintenance: the reference's purge surface
(purge_table / purge_s3_path, /root/reference/awsglue/context.py:
461-506) re-expressed on the Hadoop FileSystem API, so one code path
serves file://, hdfs://, s3a://, or any other scheme the session's
Hadoop conf can open — the same way Spark's own writers resolve paths.

Semantics preserved from the reference:
- ``retentionPeriod`` hours (default 168 = 7 days): files NEWER than
  the cutoff are retained; older files are deleted.
- ``manifestFilePath``: successfully purged files are recorded in
  ``Success.csv`` under that path (the reference's manifest contract);
  failures in ``Failed.csv``.
- dry-run listing before the irreversible delete (``DryRun`` is how
  the reference documents operators should rehearse a purge).

``transition_table`` / ``transition_s3_path`` (S3 storage-class moves,
context.py:500-545) have no analog on a generic filesystem and raise
``NotImplementedError`` with that explanation — the surface is
declared, not silently absent.
"""

from __future__ import annotations

import time
from typing import Iterable

from pyspark.sql import SparkSession

__all__ = [
    "purge_path",
    "purge_table",
    "compact_path",
    "transition_path",
    "transition_table",
]

_DEFAULT_RETENTION_HOURS = 168  # reference default: 7 days


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def _write_manifest(
    spark: SparkSession, manifest_path: str, name: str, entries: Iterable[str]
) -> None:
    fs, base = _fs_and_path(spark, manifest_path)
    jvm = spark._jvm
    out = fs.create(jvm.org.apache.hadoop.fs.Path(base, name), True)
    try:
        for e in entries:
            out.write(bytearray((e + "\n").encode("utf-8")))
    finally:
        out.close()


def purge_path(
    spark: SparkSession,
    path: str,
    retention_hours: float = _DEFAULT_RETENTION_HOURS,
    dry_run: bool = False,
    manifest_file_path: str | None = None,
) -> list[str]:
    """Recursively delete data files under ``path`` whose modification
    time is older than ``retention_hours`` (purge_s3_path,
    context.py:484-499). Returns the affected file paths; with
    ``dry_run`` nothing is deleted — rehearse first, this is the one
    operator here that destroys data. Directory structure and newer
    files are untouched; empty directories are left for the next
    compaction (cheap on object stores, where they are prefixes)."""
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    cutoff_ms = int((time.time() - retention_hours * 3600.0) * 1000)
    old: list[str] = []
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        status = it.next()
        if status.getModificationTime() < cutoff_ms:
            old.append(status.getPath().toString())
    if dry_run:
        return old
    purged, failed = [], []
    jvm = spark._jvm
    for f in old:
        try:
            if fs.delete(jvm.org.apache.hadoop.fs.Path(f), False):
                purged.append(f)
            else:
                failed.append(f)
        except Exception:  # noqa: BLE001 — per-file manifest accounting
            failed.append(f)
    if manifest_file_path is not None:
        _write_manifest(spark, manifest_file_path, "Success.csv", purged)
        _write_manifest(spark, manifest_file_path, "Failed.csv", failed)
    return purged


def purge_table(
    catalog,
    table: str,
    retention_hours: float = _DEFAULT_RETENTION_HOURS,
    dry_run: bool = False,
    manifest_file_path: str | None = None,
) -> list[str]:
    """Purge aged files of a catalog table (purge_table,
    context.py:461-483): resolve the table's storage location through
    the catalog, then apply the path purge."""
    return purge_path(
        catalog.spark,
        catalog._path(table),
        retention_hours=retention_hours,
        dry_run=dry_run,
        manifest_file_path=manifest_file_path,
    )


def transition_path(*args, **kwargs):
    """S3 storage-class transition (transition_s3_path,
    context.py:524-545) is a property of the S3 service, not of a
    filesystem — there is nothing to transition on file:// or HDFS.
    Deployments on S3 should drive lifecycle policies or the S3 API
    directly."""
    raise NotImplementedError(
        "storage-class transition is S3-service-specific; use S3 lifecycle "
        "policies (no generic-filesystem analog)"
    )


def transition_table(*args, **kwargs):
    """See ``transition_path`` (transition_table, context.py:500-523)."""
    raise NotImplementedError(
        "storage-class transition is S3-service-specific; use S3 lifecycle "
        "policies (no generic-filesystem analog)"
    )


def _partition_columns(fs, jvm, jpath) -> list[str]:
    """Hive-style partition column names under ``jpath``, outermost
    first, read from the ``col=value`` directory names (the same
    convention Spark's own partition discovery uses)."""
    cols: list[str] = []
    current = jpath
    while True:
        sub = [
            st.getPath()
            for st in fs.listStatus(current)
            if st.isDirectory() and "=" in st.getPath().getName()
        ]
        if not sub:
            return cols
        cols.append(sub[0].getName().split("=", 1)[0])
        current = sub[0]


def compact_path(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 256,
    fmt: str = "parquet",
) -> dict:
    """Small-file compaction — the other half of table maintenance:
    micro-batch sinks and partition-pruned merges accrete files far
    below the scan-efficient size, and every downstream query pays the
    per-file open/footer cost. Rewrites ``path`` into
    ``ceil(bytes / target_file_mb)`` files (coalesce — no shuffle;
    the data is already partitioned, only the file count changes).

    Hive-style partition layout (``col=value`` directories) is
    detected from the directory names and PRESERVED: the rewrite goes
    through ``partitionBy`` on the same columns, so partition pruning
    keeps working and a later partition-pruned merge
    (``merge_upsert_into_path``) still sees the layout it expects. A
    partitioned rewrite repartitions on the partition columns (one
    shuffle) so each partition lands in few files; the unpartitioned
    path stays a shuffle-free coalesce.

    The rewrite goes through a sibling temp directory then an atomic-
    as-the-filesystem-allows swap (rename old → trash, temp → path,
    delete trash), so a reader never observes a half-written table;
    on object stores without atomic rename, run during a maintenance
    window. Returns {files_before, files_after, bytes}."""
    import math

    fs, jpath = _fs_and_path(spark, path)
    jvm = spark._jvm
    summary = fs.getContentSummary(jpath)
    total_bytes = summary.getLength()
    files_before = summary.getFileCount()
    n_files = max(1, math.ceil(total_bytes / (target_file_mb * 1024 * 1024)))
    pcols = _partition_columns(fs, jvm, jpath)
    df = spark.read.format(fmt).load(path)
    tmp = jvm.org.apache.hadoop.fs.Path(path + "__compact_tmp")
    trash = jvm.org.apache.hadoop.fs.Path(path + "__compact_old")
    if pcols:
        (
            df.repartition(n_files, *pcols)
            .write.format(fmt)
            .mode("overwrite")
            .partitionBy(*pcols)
            .save(tmp.toString())
        )
    else:
        df.coalesce(n_files).write.format(fmt).mode("overwrite").save(tmp.toString())
    if not fs.rename(jpath, trash):
        raise IOError(f"compact_path: could not stage old data aside for {path}")
    if not fs.rename(tmp, jpath):
        fs.rename(trash, jpath)  # roll back
        raise IOError(f"compact_path: could not swap compacted data into {path}")
    fs.delete(trash, True)
    after = fs.getContentSummary(jpath).getFileCount()
    return {
        "files_before": int(files_before),
        "files_after": int(after),
        "bytes": int(total_bytes),
    }
