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

``transition_table`` / ``transition_path`` (S3 storage-class moves,
context.py:500-545) are re-expressed as a COMPRESSION-TIER rewrite:
aged partitions are rewritten with a denser codec under a crash-safe
root marker — the generic-filesystem version of the same
storage-cost-for-access-cost trade (on real S3, lifecycle policies
remain the right tool and the docstring says so).
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
    "recover_path",
    "ensure_recovered",
    "staged_partition_swap",
    "write_commit_marker",
    "read_commit_marker",
    "clear_commit_marker",
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


def transition_path(
    spark: SparkSession,
    path: str,
    retention_hours: float = _DEFAULT_RETENTION_HOURS,
    codec: str = "zstd",
    fmt: str = "parquet",
    dry_run: bool = False,
    manifest_file_path: str | None = None,
) -> list[str]:
    """Storage-tier transition (transition_s3_path,
    context.py:524-545). The reference flips the S3 storage class of
    aged objects — trading access latency for storage cost without
    changing what a reader sees. The generic-filesystem analog of that
    trade is a COMPRESSION-TIER rewrite: directories whose newest file
    is older than ``retention_hours`` are rewritten with a denser codec
    (default zstd — typically 25-40% smaller than the snappy hot tier
    at higher decode cost), in place, bytes-for-bytes identical data.
    Readers keep reading the same path; parquet footers carry the codec
    per column chunk, so hot and cold tiers coexist in one table.

    Granularity matches how tiering is operated at scale: Hive
    partition directories transition independently (date partitions go
    cold one at a time); an unpartitioned path transitions as a whole.
    A directory is cold only when its NEWEST data file has aged out —
    one late-arriving file keeps the partition hot. Each directory
    rewrite reuses the compaction commit protocol (stage → marker →
    swap, crash-recoverable via ``recover_path``/``ensure_recovered``),
    so a crash mid-transition never tears a partition.

    Crash safety: ALL staging happens in dot-prefixed sibling
    directories (``.name__tier_tmp`` / ``.name__tier_old``), which
    Spark's file index treats as hidden — a crash can never surface
    staged or displaced bytes to a scan, unlike a bare ``name=X__tmp``
    sibling which partition discovery would happily read as a
    partition. The only torn window (a partition directory briefly
    absent between its two renames) is covered by a single intent
    marker at ``<path>__tier_pending.json`` — a SIBLING of the path,
    so the unpartitioned case (where the path itself is renamed) never
    carries its own recovery record away with it. The marker is
    written before the first swap and retained if any directory's
    rewrite failed (only the failed directories stay listed), so
    ``recover_path``/``ensure_recovered`` can always restore a missing
    directory from its ``.old`` stage and sweep leftovers.

    ``dry_run`` returns the directories that WOULD transition;
    ``manifest_file_path`` records Success.csv/Failed.csv like the
    reference's purge manifest. Returns transitioned directory paths.
    On actual S3 deployments, prefer lifecycle policies — this operator
    is the self-managed-filesystem equivalent, not a replacement for
    the service feature."""
    ensure_recovered(spark, path)
    fs, jpath = _fs_and_path(spark, path)
    if not fs.exists(jpath):
        return []
    cutoff_ms = int((time.time() - retention_hours * 3600.0) * 1000)
    jvm = spark._jvm

    def newest_file_ms(p) -> int | None:
        newest = None
        it = fs.listFiles(p, True)
        while it.hasNext():
            st = it.next()
            if st.getPath().getName().startswith(("_", ".")):
                continue
            mt = st.getModificationTime()
            newest = mt if newest is None else max(newest, mt)
        return newest

    # leaf transition units: deepest Hive partition dirs, else the root
    rels = [
        r
        for r in list_partition_dirs(spark, path, _partition_depth(fs, jpath))
        if r
    ]
    units = [f"{path.rstrip('/')}/{rel}" for rel in rels]
    cold, cold_rels = [], []
    if units:
        for u, rel in zip(units, rels):
            newest = newest_file_ms(jvm.org.apache.hadoop.fs.Path(u))
            if newest is not None and newest < cutoff_ms:
                cold.append(u)
                cold_rels.append(rel)
    else:
        newest = newest_file_ms(jpath)
        if newest is not None and newest < cutoff_ms:
            cold, cold_rels = [path], ["."]
    if dry_run:
        return cold
    if not cold:
        return []
    _write_tier_marker(spark, path, {"op": "tier", "dirs": cold_rels})
    done, failed, failed_rels = [], [], []
    for u, rel in zip(cold, cold_rels):
        try:
            _rewrite_dir_with_codec(spark, u, codec, fmt)
            done.append(u)
        except Exception:  # noqa: BLE001 — per-dir manifest accounting
            failed.append(u)
            failed_rels.append(rel)
    if failed_rels:
        # a failed directory may sit displaced in its hidden .old stage;
        # keep its recovery record — the next reader's ensure_recovered
        # (or recover_path) restores it. Clearing here would orphan it.
        _write_tier_marker(spark, path, {"op": "tier", "dirs": failed_rels})
    else:
        _clear_tier_marker(spark, path)
    if manifest_file_path is not None:
        _write_manifest(spark, manifest_file_path, "Success.csv", done)
        _write_manifest(spark, manifest_file_path, "Failed.csv", failed)
    return done


def transition_table(
    catalog,
    table: str,
    retention_hours: float = _DEFAULT_RETENTION_HOURS,
    codec: str = "zstd",
    **kwargs,
) -> list[str]:
    """Tier-transition a catalog table's aged partitions
    (transition_table, context.py:500-523): resolve the storage
    location through the catalog, then apply the path transition."""
    return transition_path(
        catalog.spark,
        catalog._path(table),
        retention_hours=retention_hours,
        codec=codec,
        **kwargs,
    )


def _partition_depth(fs, jpath) -> int:
    """Depth of the Hive ``col=value`` directory nesting under
    ``jpath`` (0 = unpartitioned)."""
    return len(_partition_columns(fs, None, jpath))


TIER_MARKER_SUFFIX = "__tier_pending.json"


def _tier_stage_paths(jvm, dir_path: str):
    """Hidden (dot-prefixed) tmp/trash sibling paths for one directory
    rewrite — names Spark's file index skips, so staged and displaced
    bytes are never scannable."""
    P = jvm.org.apache.hadoop.fs.Path
    d = P(dir_path.rstrip("/"))
    parent, name = d.getParent(), d.getName()
    return (
        P(parent, f".{name}__tier_tmp"),
        P(parent, f".{name}__tier_old"),
    )


def _write_tier_marker(spark: SparkSession, root: str, payload: dict) -> None:
    _write_marker(spark, root, payload, "tier")


def _clear_tier_marker(spark: SparkSession, root: str) -> None:
    _clear_marker(spark, root, "tier")


def _rewrite_dir_with_codec(
    spark: SparkSession, dir_path: str, codec: str, fmt: str
) -> None:
    """Rewrite one directory's data files with ``codec``: stage to a
    hidden sibling, displace the original to a hidden ``.old``, land
    the stage, then drop the ``.old``. Every intermediate state is
    either invisible to scans or recoverable from the sibling tier
    marker. File count is preserved via coalesce — transition changes
    the codec, not the layout."""
    fs, jpath = _fs_and_path(spark, dir_path)
    jvm = spark._jvm
    n_files = max(1, int(fs.getContentSummary(jpath).getFileCount()))
    df = spark.read.format(fmt).load(dir_path)
    tmp, trash = _tier_stage_paths(jvm, dir_path)
    if fs.exists(tmp):
        fs.delete(tmp, True)
    (
        df.coalesce(n_files)
        .write.format(fmt)
        .option("compression", codec)
        .mode("overwrite")
        .save(tmp.toString())
    )
    _swap_one(fs, jpath, trash)
    try:
        _swap_one(fs, tmp, jpath)
    except IOError:
        _swap_one(fs, trash, jpath)
        raise
    fs.delete(trash, True)


def _recover_tier(spark: SparkSession, root: str) -> bool:
    """Heal a crashed transition run: for every directory the sibling
    tier marker names, restore a missing directory from its hidden
    ``.old`` stage and sweep tmp/old leftovers. The directory content
    ends up either pre- or post-transition — identical data either
    way. (The marker is a sibling of ``root``, so it survives even the
    unpartitioned case where ``root`` itself was mid-rename.)"""
    fs, _ = _fs_and_path(spark, root)
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    marker = _read_marker(spark, root, "tier")
    if marker is None:
        return False
    for rel in marker.get("dirs", []):
        d = root.rstrip("/") if rel == "." else f"{root.rstrip('/')}/{rel}"
        tmp, trash = _tier_stage_paths(jvm, d)
        dpath = P(d)
        if not fs.exists(dpath) and fs.exists(trash):
            _swap_one(fs, trash, dpath)  # crashed between the two renames
        if fs.exists(trash) and fs.exists(dpath):
            fs.delete(trash, True)
        if fs.exists(tmp):
            fs.delete(tmp, True)
    _clear_marker(spark, root, "tier")
    return True


# ------------------------------------------------------------ commit protocol
#
# Plain parquet has no transaction log, so a crash inside a multi-file
# write (partition-pruned MERGE, compaction swap) can strand a table
# half-old/half-new with nothing to say so. The commit-marker protocol
# closes that window without a table format:
#
#   1. stage ALL new bytes aside (a sibling directory) — the live table
#      is untouched while the expensive work happens;
#   2. write an INTENT MARKER (underscore-prefixed JSON inside the
#      table root, so Spark's scans ignore it) recording exactly which
#      partition directories will move and whether each pre-existed;
#   3. swap directory-by-directory, preserving every displaced old
#      directory under the stage's __old/ until the commit completes;
#   4. clear the marker, then garbage-collect the stage.
#
# Every crash window is recoverable: before the marker, the table was
# never touched (a stale stage dir is garbage); after the marker,
# ``recover_path`` rolls the table BACK to the pre-operation snapshot
# (displaced directories restored, half-landed new ones removed) — the
# merge is an upsert, so the job simply re-runs it. Readers call
# ``ensure_recovered`` (wired into ``WarehouseCatalog.read_table``), so
# unmarked partial state is never silently read. Single-writer per
# table, same as the reference's sinks.

MERGE_MARKER = "__commit_pending.json"
COMPACT_MARKER_SUFFIX = "__compact_pending"


def _read_small_text(fs, jvm, jpath) -> str:
    stream = fs.open(jpath)
    try:
        try:
            return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
        except Exception:  # noqa: BLE001 — byte loop fallback (tiny files)
            data = bytearray()
            b = stream.read()
            while b != -1:
                data.append(b)
                b = stream.read()
            return data.decode("utf-8")
    finally:
        stream.close()


def _swap_one(fs, src, dst) -> None:
    """Atomic-as-the-FS-allows directory move; the single primitive the
    commit sequence is built from (and the test fault-injection
    point)."""
    parent = dst.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    if not fs.rename(src, dst):
        raise IOError(f"commit swap failed: {src} -> {dst}")


def _marker_jpath(spark: SparkSession, table_path: str, kind: str):
    """Resolve a marker location: merge markers live INSIDE the table
    (underscore-prefixed, invisible to scans; the table dir itself is
    never renamed by a merge), tier markers live as a SIBLING
    (``<path>__tier_pending.json``) because an unpartitioned transition
    renames the path itself and must not carry its recovery record
    away with it."""
    jvm = spark._jvm
    if kind == "merge":
        return jvm.org.apache.hadoop.fs.Path(table_path, MERGE_MARKER)
    return jvm.org.apache.hadoop.fs.Path(table_path.rstrip("/") + TIER_MARKER_SUFFIX)


def _write_marker(spark: SparkSession, table_path: str, payload: dict, kind: str) -> None:
    import json

    fs, _ = _fs_and_path(spark, table_path)
    out = fs.create(_marker_jpath(spark, table_path, kind), True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()


def _read_marker(spark: SparkSession, table_path: str, kind: str) -> dict | None:
    import json

    fs, _ = _fs_and_path(spark, table_path)
    marker = _marker_jpath(spark, table_path, kind)
    if not fs.exists(marker):
        return None
    return json.loads(_read_small_text(fs, spark._jvm, marker))


def _clear_marker(spark: SparkSession, table_path: str, kind: str) -> None:
    fs, _ = _fs_and_path(spark, table_path)
    fs.delete(_marker_jpath(spark, table_path, kind), False)


def write_commit_marker(spark: SparkSession, table_path: str, payload: dict) -> None:
    _write_marker(spark, table_path, payload, "merge")


def read_commit_marker(spark: SparkSession, table_path: str) -> dict | None:
    return _read_marker(spark, table_path, "merge")


def clear_commit_marker(spark: SparkSession, table_path: str) -> None:
    _clear_marker(spark, table_path, "merge")


def list_partition_dirs(spark: SparkSession, root: str, depth: int) -> list[str]:
    """Relative ``col=value[/...]`` partition directory paths exactly
    ``depth`` levels under ``root``, as the WRITER laid them out — the
    ground truth for the swap list, so value escaping
    (__HIVE_DEFAULT_PARTITION__, URL-encoding) never needs
    reimplementing."""
    fs, jpath = _fs_and_path(spark, root)
    out: list[str] = []

    def walk(p, rel: str, d: int) -> None:
        if d == 0:
            out.append(rel)
            return
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory() and "=" in name:
                walk(st.getPath(), f"{rel}/{name}" if rel else name, d - 1)

    walk(jpath, "", depth)
    return sorted(out)


def staged_partition_swap(
    spark: SparkSession, table_path: str, stage_dir: str, parts_meta: list[dict]
) -> None:
    """Phase 3 of the protocol: land each staged partition directory,
    moving any displaced old directory under ``<stage>/__old/`` first
    so the pre-operation bytes survive until the marker clears."""
    fs, _ = _fs_and_path(spark, table_path)
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    for m in parts_meta:
        rel = m["rel"]
        dst = P(f"{table_path}/{rel}")
        if m["had_old"]:
            _swap_one(fs, dst, P(f"{stage_dir}/__old/{rel}"))
        _swap_one(fs, P(f"{stage_dir}/{rel}"), dst)


def recover_path(spark: SparkSession, path: str) -> dict:
    """Heal ``path`` after a crashed staged commit. Merge markers roll
    the table BACK to the pre-merge snapshot (upserts re-run safely);
    compaction markers resolve forward when the swap completed (the
    content is identical either way) and back when it didn't. No-op on
    a clean table. Returns which recoveries ran."""
    fs, jpath = _fs_and_path(spark, path)
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    actions = {"merge_rolled_back": False, "compact_resolved": False}

    marker = read_commit_marker(spark, path)
    if marker is not None and marker.get("op") == "merge":
        stage = marker["stage"]
        for m in marker["parts"]:
            rel, had_old = m["rel"], m["had_old"]
            dst = P(f"{path}/{rel}")
            old = P(f"{stage}/__old/{rel}")
            if had_old:
                if fs.exists(old):
                    # swap started for this partition: drop whatever
                    # landed, restore the displaced original
                    if fs.exists(dst):
                        fs.delete(dst, True)
                    _swap_one(fs, old, dst)
                # else: untouched — the original is still in place
            elif fs.exists(dst):
                # brand-new partition partially landed: remove it
                fs.delete(dst, True)
        if fs.exists(P(stage)):
            fs.delete(P(stage), True)
        clear_commit_marker(spark, path)
        actions["merge_rolled_back"] = True

    cmarker = P(path.rstrip("/") + COMPACT_MARKER_SUFFIX)
    if fs.exists(cmarker):
        tmp = P(path + "__compact_tmp")
        trash = P(path + "__compact_old")
        if fs.exists(jpath):
            # either the swap completed (trash = stale old data) or it
            # never started (tmp = discarded compaction); both leftovers go
            if fs.exists(trash):
                fs.delete(trash, True)
            if fs.exists(tmp):
                fs.delete(tmp, True)
        elif fs.exists(trash):
            # crashed between the two renames: restore the original
            _swap_one(fs, trash, jpath)
            if fs.exists(tmp):
                fs.delete(tmp, True)
        fs.delete(cmarker, False)
        actions["compact_resolved"] = True

    actions["tier_resolved"] = _recover_tier(spark, path)
    return actions


def ensure_recovered(spark: SparkSession, path: str) -> None:
    """Reader-side guard: if a crashed commit left a marker, heal the
    table to its pre-operation snapshot BEFORE reading. Two cheap
    existence checks on the clean path — negligible against any scan."""
    fs, _ = _fs_and_path(spark, path)
    jvm = spark._jvm
    P = jvm.org.apache.hadoop.fs.Path
    if (
        fs.exists(P(path, MERGE_MARKER))
        or fs.exists(P(path.rstrip("/") + COMPACT_MARKER_SUFFIX))
        or fs.exists(P(path.rstrip("/") + TIER_MARKER_SUFFIX))
    ):
        recover_path(spark, path)


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
    delete trash) under a sibling COMMIT MARKER: the marker is written
    before the first rename and removed after the last delete, so a
    crash anywhere inside the swap is detected and resolved by
    ``recover_path`` / ``ensure_recovered`` instead of leaving a
    missing or duplicated table. On object stores without atomic
    rename, run during a maintenance window. Returns {files_before,
    files_after, bytes}."""
    import math

    ensure_recovered(spark, path)
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
    cmarker = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + COMPACT_MARKER_SUFFIX)
    fs.create(cmarker, True).close()
    _swap_one(fs, jpath, trash)
    try:
        _swap_one(fs, tmp, jpath)
    except IOError:
        _swap_one(fs, trash, jpath)  # roll back
        fs.delete(cmarker, False)
        raise
    fs.delete(trash, True)
    fs.delete(cmarker, False)
    after = fs.getContentSummary(jpath).getFileCount()
    return {
        "files_before": int(files_before),
        "files_after": int(after),
        "bytes": int(total_bytes),
    }
