"""Deep-commit-chain stress for the transactional commit log (VERDICT
r9 ask #3): build a 1,000-commit table with a mixed operation history
(appends, row-level DML, compactions, schema + constraint changes),
then measure the two structures whose failure mode only appears at
depth — the checkpoint-rolled txid map and the delta-manifest replay
chain.

Asserted/measured:
  1. COLD snapshot resolution on a fresh handle reads O(interval)
     manifests (delta chain back to the nearest checkpoint), never
     O(commits) — counted via a _read_manifest hook.
  2. Point-lookup latency (Bloom-pruned equality read) is FLAT in
     commit depth: measured at depth ~200, ~600 and 1,000 on warm
     handles.
  3. Idempotent-replay (app_txid) MISS lookup reads O(interval)
     manifests at depth 1,000.
  4. Per-commit wall time stays flat across the history (no O(depth)
     term creeps into commit): reported per-100-commit band.
  5. Answers stay right: a sample of historical versions time-travels
     to exactly the row count recorded when that version committed.

Usage:  python scripts/txlog_depth_stress.py [DEPTH] [ROOT]
Prints a summary block for SCALE.md; exit 1 on any violated pin.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import TxTable

INTERVAL = 10
ROWS_PER_APPEND = 10


def count_manifest_reads(fn):
    """Run fn with TxTable._read_manifest instrumented; return
    (result, versions_read)."""
    reads: list[int] = []
    orig = TxTable._read_manifest
    try:
        TxTable._read_manifest = (
            lambda self, v: reads.append(v) or orig(self, v)
        )
        out = fn()
    finally:
        TxTable._read_manifest = orig
    return out, reads


def main() -> int:
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    root = sys.argv[2] if len(sys.argv) > 2 else None
    cleanup = root is None
    if root is None:
        root = tempfile.mkdtemp(prefix="txlog_depth_")

    spark = get_spark(
        app_name="txlog-depth-stress", cpus=8, shuffle_partitions=8
    )
    t = TxTable(
        spark,
        root,
        stats_columns=["id"],
        bloom_columns=["id"],
        checkpoint_interval=INTERVAL,
    )

    val_col = "val"  # renamed mid-history to exercise schema evolution
    expected = 0
    next_id = 0
    version_counts: dict[int, int] = {}
    commit_times: list[float] = []
    lookup_latency: dict[int, float] = {}
    failures: list[str] = []

    def fresh_rows(n):
        nonlocal next_id
        lo = next_id
        next_id += n
        return spark.range(lo, lo + n).selectExpr(
            "id", f"id * 2 as {val_col}"
        ).coalesce(1)

    def warm_point_lookup():
        # Bloom-pruned single-id read on a WARM handle: resolution must
        # come from the manifest cache, the probe from the manifest
        # blooms — wall time must not grow with commit depth.
        target = max(next_id - ROWS_PER_APPEND, 0)
        t.read(equality_filter={"id": target}).filter(
            f"id = {target}"
        ).count()  # warm the code path once
        t0 = time.perf_counter()
        for _ in range(3):
            t.read(equality_filter={"id": target}).filter(
                f"id = {target}"
            ).count()
        return (time.perf_counter() - t0) / 3

    build_t0 = time.time()
    i = 0
    while i < depth:
        c0 = time.perf_counter()
        op = i % 100
        if i in (300,) and val_col == "val":
            t.rename_column("val", "score")
            val_col = "score"
        elif i == 600:
            t.set_constraints({"id_nonneg": "id >= 0"})
        elif i in (250, 500, 750):
            t.compact()
        elif op == 50 and expected >= ROWS_PER_APPEND:
            # delete the oldest half of the most recent append (those
            # ids are guaranteed present and never deleted before)
            lo = next_id - ROWS_PER_APPEND
            t.delete(
                f"id >= {lo} AND id < {lo + 5}",
                range_filter={"id": (lo, lo + 4)},
            )
            expected -= 5
        elif op == 70 and expected:
            lo = next_id - 5
            t.update(
                f"id >= {lo}",
                {val_col: f"{val_col} + 1"},
                range_filter={"id": (lo, next_id)},
            )
        elif op == 90 and expected:
            # upsert: 2 existing ids rewritten + 1 brand-new id
            lo = next_id - 2
            up = spark.range(lo, lo + 3).selectExpr(
                "id", f"id * 3 as {val_col}"
            ).coalesce(1)
            next_id += 1
            t.merge(up, ["id"])
            expected += 1
        else:
            t.append(fresh_rows(ROWS_PER_APPEND))
            expected += ROWS_PER_APPEND
        commit_times.append(time.perf_counter() - c0)
        version_counts[t.current_version()] = expected
        i += 1
        if i in (200, 600, depth):
            lookup_latency[i] = warm_point_lookup()
        if i % 100 == 0:
            band = commit_times[i - 100 : i]
            print(
                f"  commits {i - 100:4d}-{i:4d}: "
                f"{sum(band) / len(band) * 1000:6.0f} ms/commit  "
                f"rows={expected}  version={t.current_version()}"
            )
    build_s = time.time() - build_t0

    print(f"\nbuilt {depth} commits in {build_s:.0f}s "
          f"(head version {t.current_version()}, {expected} rows)")

    # --- pin 1: cold resolution is O(interval), not O(commits) --------
    def cold_read():
        fresh = TxTable(spark, root, checkpoint_interval=INTERVAL)
        return fresh.read().count()

    n, reads = count_manifest_reads(cold_read)
    print(f"cold resolution at depth {depth}: {len(reads)} manifest "
          f"reads (interval={INTERVAL}), rows={n}")
    if n != expected:
        failures.append(f"cold read rows {n} != expected {expected}")
    if len(reads) > INTERVAL + 3:
        failures.append(
            f"cold resolution read {len(reads)} manifests "
            f"(> interval+3 = {INTERVAL + 3}): {sorted(set(reads))[:20]}"
        )

    # --- pin 2: point-lookup latency flat in depth --------------------
    lats = sorted(lookup_latency.items())
    print("warm point-lookup latency by depth: " + ", ".join(
        f"{d} commits: {s * 1000:.0f} ms" for d, s in lats
    ))
    if lats[-1][1] > 3.0 * max(lats[0][1], 0.05):
        failures.append(
            f"point lookup grew with depth: {lats}"
        )

    # --- pin 3: txid MISS lookup is O(interval) at depth --------------
    _, reads = count_manifest_reads(
        lambda: t.txid_committed_version("never-committed")
    )
    print(f"txid miss at depth {depth}: {len(reads)} manifest reads")
    if len(reads) > INTERVAL + 3:
        failures.append(f"txid miss read {len(reads)} manifests")

    # --- pin 4: commit time flat (first band vs last band) ------------
    first = sum(commit_times[:100]) / 100
    last = sum(commit_times[-100:]) / 100
    print(f"per-commit wall: first-100 {first * 1000:.0f} ms, "
          f"last-100 {last * 1000:.0f} ms")
    if last > 3.0 * first:
        failures.append(
            f"commit time grew with depth: {first:.3f}s -> {last:.3f}s"
        )

    # --- pin 5: deep history still answers exactly --------------------
    versions = sorted(version_counts)
    sample = versions[:: max(1, len(versions) // 10)][:12]
    for v in sample:
        got = t.read(version=v).count()
        if got != version_counts[v]:
            failures.append(
                f"time travel v{v}: {got} rows != {version_counts[v]}"
            )
    print(f"time-travel sample ({len(sample)} versions): "
          + ("all exact" if not any(f.startswith("time travel") for f in failures) else "MISMATCH"))

    print("\nRESULT: " + ("OK" if not failures else "FAIL"))
    for f in failures:
        print("  " + f)
    spark.stop()
    if cleanup:
        shutil.rmtree(root, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
