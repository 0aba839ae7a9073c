"""Purge maintenance: retention filtering, dry-run rehearsal, manifest
accounting — against real files through the Hadoop FS API."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources import maintenance
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.maintenance import (
    purge_path,
    purge_table,
    transition_path,
)


@pytest.fixture()
def aged_dir(spark, tmp_path):
    d = tmp_path / "data"
    (d / "sub").mkdir(parents=True)
    old1 = d / "old1.parquet"
    old2 = d / "sub" / "old2.parquet"
    new = d / "new.parquet"
    for f in (old1, old2, new):
        f.write_bytes(b"x")
    # age two files to ~10 days old
    ten_days_ago = time.time() - 10 * 24 * 3600
    os.utime(old1, (ten_days_ago, ten_days_ago))
    os.utime(old2, (ten_days_ago, ten_days_ago))
    return d, {str(old1), str(old2)}, str(new)


def test_dry_run_lists_without_deleting(spark, aged_dir):
    d, old, _ = aged_dir
    listed = purge_path(spark, str(d), retention_hours=168, dry_run=True)
    assert {p.replace("file:", "") for p in listed} == old
    assert all(os.path.exists(p) for p in old)


def test_purge_deletes_only_aged_files(spark, aged_dir):
    d, old, new = aged_dir
    purged = purge_path(spark, str(d), retention_hours=168)
    assert {p.replace("file:", "") for p in purged} == old
    assert not any(os.path.exists(p) for p in old)
    assert os.path.exists(new)


def test_purge_writes_success_manifest(spark, aged_dir, tmp_path):
    d, old, _ = aged_dir
    manifest = tmp_path / "manifest"
    purge_path(spark, str(d), retention_hours=168, manifest_file_path=str(manifest))
    success = (manifest / "Success.csv").read_text().strip().splitlines()
    assert {p.replace("file:", "") for p in success} == old
    assert (manifest / "Failed.csv").read_text() == ""


def test_purge_table_resolves_catalog_location(spark, tmp_path):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import (
        WarehouseCatalog,
    )

    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    spark.range(3).write.parquet(cat._path("t1"))
    # nothing old enough: purge keeps everything
    assert purge_table(cat, "t1", retention_hours=1) == []
    assert cat.read_table("t1").count() == 3
    # retention 0: every data file is past retention
    purged = purge_table(cat, "t1", retention_hours=0)
    assert purged and all("t1" in p for p in purged)


def test_missing_path_is_noop(spark, tmp_path):
    assert purge_path(spark, str(tmp_path / "absent"), dry_run=True) == []


def _codecs_in_dir(d: str) -> set[str]:
    import pyarrow.parquet as pq

    out = set()
    for root, _dirs, files in os.walk(d):
        for f in files:
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                md = pq.ParquetFile(os.path.join(root, f)).metadata
                for rg in range(md.num_row_groups):
                    out.add(md.row_group(rg).column(0).compression)
    return out


def _age_dir_files(d: str, days: float = 10.0) -> None:
    then = time.time() - days * 24 * 3600
    for root, _dirs, files in os.walk(d):
        for f in files:
            os.utime(os.path.join(root, f), (then, then))


def test_transition_rewrites_cold_partitions_only(spark, tmp_path):
    path = str(tmp_path / "tiered")
    df = spark.range(300).withColumn("bucket", (F.col("id") % 3).cast("int"))
    df.write.partitionBy("bucket").parquet(path)
    # age bucket=0 and bucket=1; bucket=2 stays hot
    _age_dir_files(os.path.join(path, "bucket=0"))
    _age_dir_files(os.path.join(path, "bucket=1"))

    listed = transition_path(spark, path, retention_hours=168, dry_run=True)
    assert sorted(p.rsplit("/", 1)[1] for p in listed) == ["bucket=0", "bucket=1"]

    manifest = str(tmp_path / "tier_manifest")
    done = transition_path(
        spark, path, retention_hours=168, codec="zstd",
        manifest_file_path=manifest,
    )
    assert sorted(p.rsplit("/", 1)[1] for p in done) == ["bucket=0", "bucket=1"]
    # data identical, cold partitions now zstd, hot partition untouched
    got = spark.read.parquet(path)
    assert got.count() == 300
    assert got.groupBy("bucket").count().orderBy("bucket").collect()[0]["count"] == 100
    assert _codecs_in_dir(os.path.join(path, "bucket=0")) == {"ZSTD"}
    assert _codecs_in_dir(os.path.join(path, "bucket=1")) == {"ZSTD"}
    assert "ZSTD" not in _codecs_in_dir(os.path.join(path, "bucket=2"))
    success = open(os.path.join(manifest, "Success.csv")).read().strip().splitlines()
    assert len(success) == 2


def test_transition_unpartitioned_whole_path(spark, tmp_path):
    path = str(tmp_path / "flat")
    spark.range(50).write.parquet(path)
    assert transition_path(spark, path, retention_hours=168) == []  # still hot
    _age_dir_files(path)
    done = transition_path(spark, path, retention_hours=168, codec="zstd")
    assert done == [path]
    assert spark.read.parquet(path).count() == 50
    assert _codecs_in_dir(path) == {"ZSTD"}


def test_transition_crash_between_renames_recovers(spark, tmp_path):
    """Kill-mid-swap: partition displaced to its hidden .old, marker
    present, partition dir absent — the reader-side guard must restore
    the pre-transition bytes and clear the stage."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.maintenance import (
        ensure_recovered,
    )

    path = str(tmp_path / "crash")
    df = spark.range(90).withColumn("bucket", (F.col("id") % 3).cast("int"))
    df.write.partitionBy("bucket").parquet(path)
    # simulate: marker written, bucket=1 moved aside, crash before landing
    maintenance._write_tier_marker(spark, path, {"op": "tier", "dirs": ["bucket=1"]})
    os.rename(
        os.path.join(path, "bucket=1"), os.path.join(path, ".bucket=1__tier_old")
    )
    # hidden stage is invisible to a scan even BEFORE recovery
    assert spark.read.parquet(path).count() == 60
    ensure_recovered(spark, path)
    assert not os.path.exists(path + maintenance.TIER_MARKER_SUFFIX)
    assert not os.path.exists(os.path.join(path, ".bucket=1__tier_old"))
    assert spark.read.parquet(path).count() == 90


def test_compact_path_reduces_files_preserving_rows(spark, tmp_path):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.maintenance import (
        compact_path,
    )

    path = str(tmp_path / "frag")
    # 16 tiny files
    spark.range(1000).repartition(16).write.parquet(path)
    import os

    before_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(before_files) == 16
    stats = compact_path(spark, path, target_file_mb=256)
    assert stats["files_before"] >= 16  # + _SUCCESS
    after_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(after_files) == 1
    got = spark.read.parquet(path)
    assert got.count() == 1000
    assert got.agg({"id": "sum"}).first()[0] == 999 * 1000 // 2
    # no leftover temp/trash directories
    assert not os.path.exists(path + "__compact_tmp")
    assert not os.path.exists(path + "__compact_old")


def test_compact_path_preserves_partition_layout(spark, tmp_path):
    """Compacting a Hive-partitioned table must keep the col=value
    directory layout (partition pruning and partition-pruned merges
    depend on it), not flatten it into root files."""
    import os

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.maintenance import (
        compact_path,
    )

    path = str(tmp_path / "ptable")
    df = spark.createDataFrame(
        [(i, "b1" if i % 2 else "b2") for i in range(100)], "k int, dt string"
    )
    df.repartition(8).write.partitionBy("dt").parquet(path)
    compact_path(spark, path, target_file_mb=256)
    entries = os.listdir(path)
    assert sorted(e for e in entries if "=" in e) == ["dt=b1", "dt=b2"]
    assert not any(e.endswith(".parquet") for e in entries), entries
    got = spark.read.parquet(path)
    assert got.count() == 100
    assert got.filter(F.col("dt") == "b1").count() == 50
    # partition pruning still works on the compacted layout
    plan = (
        got.filter(F.col("dt") == "b1")._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(dt" in plan


# ------------------------------------------------------------ commit protocol


def _snapshot(spark, path):
    return sorted(tuple(r) for r in spark.read.parquet(path).collect())


def test_merge_crash_mid_swap_recovers_to_premerge_snapshot(
    spark, tmp_path, monkeypatch
):
    """Kill the merge between partition swaps: the intent marker plus
    preserved __old/ directories must let recovery roll the table BACK
    to the exact pre-merge snapshot, readers must auto-heal, and a
    re-run of the same merge must then land the full result."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import joins as J

    path = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", "old1"), (2, "b", "old2"), (3, "c", "old3")],
        "k int, dt string, v string",
    )
    base.write.partitionBy("dt").parquet(path)
    before = _snapshot(spark, path)
    stage = spark.createDataFrame(
        [(1, "a", "NEW1"), (2, "b", "NEW2"), (9, "d", "NEW9")],
        "k int, dt string, v string",
    )

    real_swap = maintenance._swap_one
    calls = {"n": 0}

    def crashing_swap(fs, src, dst):
        calls["n"] += 1
        if calls["n"] == 3:  # die after the first partition fully landed
            raise IOError("injected crash")
        real_swap(fs, src, dst)

    monkeypatch.setattr(maintenance, "_swap_one", crashing_swap)
    with pytest.raises(IOError, match="injected crash"):
        J.merge_upsert_into_path(spark, path, stage, ["k", "dt"], ["dt"])
    monkeypatch.setattr(maintenance, "_swap_one", real_swap)

    # the table is stranded mid-swap with a marker present
    assert maintenance.read_commit_marker(spark, path) is not None
    # reader-side guard heals to the pre-merge snapshot
    maintenance.ensure_recovered(spark, path)
    assert maintenance.read_commit_marker(spark, path) is None
    assert _snapshot(spark, path) == before

    # the upsert re-runs cleanly after recovery
    J.merge_upsert_into_path(spark, path, stage, ["k", "dt"], ["dt"])
    got = {(r.k, r.dt): r.v for r in spark.read.parquet(path).collect()}
    assert got == {
        (1, "a"): "NEW1", (2, "b"): "NEW2", (3, "c"): "old3", (9, "d"): "NEW9",
    }


def test_catalog_read_table_heals_crashed_merge(spark, tmp_path, monkeypatch):
    """WarehouseCatalog.read_table must never serve half-merged state:
    after an injected mid-swap crash it reads the pre-merge rows."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import joins as J
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import (
        WarehouseCatalog,
    )

    cat = WarehouseCatalog(spark, str(tmp_path))
    base = spark.createDataFrame(
        [(1, "a", "old1"), (2, "b", "old2")], "k int, dt string, v string"
    )
    base.write.partitionBy("dt").parquet(cat._path("t"))
    before = _snapshot(spark, cat._path("t"))
    stage = spark.createDataFrame(
        [(1, "a", "NEW1"), (2, "b", "NEW2")], "k int, dt string, v string"
    )

    real_swap = maintenance._swap_one
    calls = {"n": 0}

    def crashing_swap(fs, src, dst):
        calls["n"] += 1
        if calls["n"] == 3:
            raise IOError("injected crash")
        real_swap(fs, src, dst)

    monkeypatch.setattr(maintenance, "_swap_one", crashing_swap)
    with pytest.raises(IOError):
        J.merge_upsert_into_path(spark, cat._path("t"), stage, ["k", "dt"], ["dt"])
    monkeypatch.setattr(maintenance, "_swap_one", real_swap)

    assert sorted(tuple(r) for r in cat.read_table("t").collect()) == before


def test_compact_crash_between_renames_restores_table(spark, tmp_path, monkeypatch):
    """Kill compaction after the table was staged aside but before the
    compacted copy landed: the sibling marker lets recovery restore the
    original, and a clean re-compaction then succeeds."""
    path = str(tmp_path / "c")
    spark.range(0, 100).repartition(8).write.parquet(path)
    before = _snapshot(spark, path)

    real_swap = maintenance._swap_one
    calls = {"n": 0}

    def crashing_swap(fs, src, dst):
        calls["n"] += 1
        if calls["n"] == 1:  # old -> trash succeeded conceptually? no: die on FIRST rename completion boundary
            real_swap(fs, src, dst)
            raise IOError("injected crash")
        real_swap(fs, src, dst)

    monkeypatch.setattr(maintenance, "_swap_one", crashing_swap)
    with pytest.raises(IOError, match="injected crash"):
        maintenance.compact_path(spark, path, target_file_mb=256)
    monkeypatch.setattr(maintenance, "_swap_one", real_swap)

    # table dir is missing; marker + trash exist -> recovery restores it
    acts = maintenance.recover_path(spark, path)
    assert acts["compact_resolved"]
    assert _snapshot(spark, path) == before
    res = maintenance.compact_path(spark, path, target_file_mb=256)
    assert res["files_after"] <= res["files_before"]
    assert _snapshot(spark, path) == before


def test_recover_path_noop_on_clean_table(spark, tmp_path):
    path = str(tmp_path / "clean")
    spark.range(0, 10).write.parquet(path)
    before = _snapshot(spark, path)
    acts = maintenance.recover_path(spark, path)
    assert acts == {"merge_rolled_back": False, "compact_resolved": False, "tier_resolved": False}
    assert _snapshot(spark, path) == before


def test_transition_crash_unpartitioned_recovers(spark, tmp_path):
    """The unpartitioned case renames the table path itself — the
    intent marker is a SIBLING so it cannot travel away with the
    rename. Crash between the two renames: path gone, bytes in the
    hidden .old — recovery must restore them."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.maintenance import (
        ensure_recovered,
    )

    path = str(tmp_path / "flatcrash")
    spark.range(40).write.parquet(path)
    maintenance._write_tier_marker(spark, path, {"op": "tier", "dirs": ["."]})
    parent, name = os.path.split(path)
    os.rename(path, os.path.join(parent, f".{name}__tier_old"))
    assert not os.path.exists(path)
    ensure_recovered(spark, path)
    assert os.path.exists(path)
    assert not os.path.exists(path + maintenance.TIER_MARKER_SUFFIX)
    assert spark.read.parquet(path).count() == 40


def test_transition_keeps_marker_for_failed_dirs(spark, tmp_path, monkeypatch):
    """If a directory's rewrite fails, its recovery record must stay:
    clearing the run marker would orphan bytes possibly displaced into
    the hidden .old stage."""
    path = str(tmp_path / "partial")
    df = spark.range(60).withColumn("bucket", (F.col("id") % 2).cast("int"))
    df.write.partitionBy("bucket").parquet(path)
    _age_dir_files(path)

    real = maintenance._rewrite_dir_with_codec

    def flaky(spark_, dir_path, codec, fmt):
        if dir_path.endswith("bucket=1"):
            raise IOError("injected rewrite failure")
        return real(spark_, dir_path, codec, fmt)

    monkeypatch.setattr(maintenance, "_rewrite_dir_with_codec", flaky)
    done = transition_path(spark, path, retention_hours=168, codec="zstd")
    assert [p.rsplit("/", 1)[1] for p in done] == ["bucket=0"]
    marker = maintenance._read_marker(spark, path, "tier")
    assert marker is not None and marker["dirs"] == ["bucket=1"]
    # table still fully readable; the next reader heals/clears the marker
    assert spark.read.parquet(path).count() == 60
    maintenance.ensure_recovered(spark, path)
    assert maintenance._read_marker(spark, path, "tier") is None
    assert spark.read.parquet(path).count() == 60
