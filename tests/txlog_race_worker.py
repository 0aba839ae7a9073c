"""Standalone writer process for the multi-process TxTable contention
tests (tests/test_txlog.py::test_two_processes_racing_appends_lose_no_commits
and ::test_cross_process_crash_during_race_loses_no_commits).

Each worker runs in its OWN Python process with its OWN SparkSession —
a genuinely independent JVM racing the commit protocol's atomic
version claim against the other worker, the scenario the in-process
conflict tests cannot produce.

Usage:
  python txlog_race_worker.py <table_root> <worker_id> <n_commits> <rows_per>
      [--crash <stage_only|zero_claim|torn_json|no_hint>]
      [--crash-after <k>] [--grace <seconds>]

Clean mode exits 0 iff every one of its commits landed (conflicts are
retried). Crash mode (VERDICT r11 ask #6) performs ``--crash-after``
clean commits, then DIES via ``os._exit(17)`` at a real protocol point
— no abort(), no atexit, no JVM shutdown hooks (the gateway JVM exits
on stdin EOF) — leaving exactly the on-disk state a kill -9 at that
point leaves, visible to the racing writer through the real
filesystem:

  stage_only  staged bytes exist, no manifest references them
  zero_claim  the exclusive create of the claim file succeeded
              (``open(path, 'x')`` — rebase-and-retry on a lost race,
              like the real claimer) but ZERO bytes landed
  torn_json   the claim holds partial manifest JSON (torn write)
  no_hint     the manifest landed (commit is durable) but the writer
              died before the advisory head-hint write

The crash batch's ids are deterministic (same formula as clean
batches), so the orchestrator can replay the crashed app transaction
from ITS process and assert exactly-once across the process boundary.
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    argv = list(sys.argv[1:])
    crash_point: str | None = None
    crash_after = 0
    grace = 0.0
    for flag in ("--crash", "--crash-after", "--grace"):
        if flag in argv:
            i = argv.index(flag)
            val = argv[i + 1]
            del argv[i : i + 2]
            if flag == "--crash":
                crash_point = val
            elif flag == "--crash-after":
                crash_after = int(val)
            else:
                grace = float(val)
    root, worker, n_commits, rows_per = (
        argv[0],
        int(argv[1]),
        int(argv[2]),
        int(argv[3]),
    )
    from pyspark.sql import Row, SparkSession

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
        CommitConflictError,
        TxTable,
    )

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"txlog-race-worker-{worker}")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    table = TxTable(spark, root, torn_grace_seconds=grace)

    def batch(c: int):
        base = worker * 1_000_000 + c * rows_per
        return spark.createDataFrame(
            [Row(id=base + i, w=worker) for i in range(rows_per)]
        ).coalesce(1)

    committed = []
    n_clean = crash_after if crash_point else n_commits
    for c in range(n_clean):
        df = batch(c)
        # append rebases internally on a lost race; re-loop only if it
        # exhausts its retry budget under extreme interleaving
        while True:
            try:
                committed.append(table.append(df))
                break
            except CommitConflictError:
                continue

    if crash_point is not None:
        txid = f"crash-{worker}"
        if crash_point == "stage_only":
            tx = table.begin(app_txid=txid)
            tx.append(batch(n_clean))
            assert tx._staged_files(), "precondition: bytes were staged"
            print(f"CRASH stage_only txid={txid}", flush=True)
            os._exit(17)
        elif crash_point in ("zero_claim", "torn_json"):
            # stage like a real claimer, then die while writing the claim
            tx = table.begin(app_txid=txid)
            tx.append(batch(n_clean))
            log_dir = os.path.join(root, "_txlog")
            while True:
                v = table.current_version() + 1
                path = os.path.join(log_dir, f"{v:020d}.json")
                try:
                    fh = open(path, "x")  # exclusive create = the claim
                except FileExistsError:
                    continue  # lost the race — rebase to the new head
                if crash_point == "torn_json":
                    fh.write(
                        '{"version": %d, "op": "append", "files": [{"pa' % v
                    )
                fh.close()
                print(f"CRASH {crash_point} version={v} txid={txid}", flush=True)
                os._exit(17)
        else:  # no_hint: die between the durable claim and the hint write
            assert crash_point == "no_hint", crash_point

            def _die(self, version):  # noqa: ANN001 — monkeypatched method
                print(f"CRASH no_hint version={version} txid={txid}", flush=True)
                os._exit(17)

            TxTable._write_head_hint = _die
            tx = table.begin(app_txid=txid)
            tx.append(batch(n_clean))
            tx.commit()  # never returns — _die fires inside the claim
            raise AssertionError("commit returned past the crash point")

    # every commit must have claimed a DISTINCT version
    if len(set(committed)) != n_commits:
        print(f"worker {worker}: duplicate versions {committed}", file=sys.stderr)
        return 1
    print(f"worker {worker}: versions {sorted(committed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
