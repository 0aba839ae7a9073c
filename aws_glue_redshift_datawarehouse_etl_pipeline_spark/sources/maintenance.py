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

__all__ = ["purge_path", "purge_table", "transition_path", "transition_table"]

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
