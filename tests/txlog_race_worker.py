"""Standalone writer process for the multi-process TxTable contention
test (tests/test_txlog.py::test_two_processes_racing_appends_lose_no_commits).

Each worker runs in its OWN Python process with its OWN SparkSession —
a genuinely independent JVM racing the commit protocol's atomic
version claim against the other worker, the scenario the in-process
conflict tests cannot produce.

Usage: python txlog_race_worker.py <table_root> <worker_id> <n_commits> <rows_per_commit>
Exits 0 iff every one of its commits landed (conflicts are retried).
"""

from __future__ import annotations

import sys


def main() -> int:
    root, worker, n_commits, rows_per = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        int(sys.argv[4]),
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
    table = TxTable(spark, root)
    committed = []
    for c in range(n_commits):
        base = worker * 1_000_000 + c * rows_per
        df = spark.createDataFrame(
            [Row(id=base + i, w=worker) for i in range(rows_per)]
        ).coalesce(1)
        # append rebases internally on a lost race; re-loop only if it
        # exhausts its retry budget under extreme interleaving
        while True:
            try:
                committed.append(table.append(df))
                break
            except CommitConflictError:
                continue
    # every commit must have claimed a DISTINCT version
    if len(set(committed)) != n_commits:
        print(f"worker {worker}: duplicate versions {committed}", file=sys.stderr)
        return 1
    print(f"worker {worker}: versions {sorted(committed)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
