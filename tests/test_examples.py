"""End-to-end pins for the runnable example jobs: each test executes an
example script exactly as its docstring documents (own process, own
SparkSession) against sf0.001 and asserts the governed-warehouse
invariants — TransactionalCatalog is the examples' default front door,
so these pin the star loader running on TxTable-backed tables."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = "/root/testdata/sf0.001"


def _run_example(script: str, *extra: str, warehouse: str) -> str:
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "examples", script),
            "--JOB_NAME", "pytest-pin",
            "--src_dir", SRC,
            "--warehouse_dir", warehouse,
            *extra,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "PYTHONPATH": REPO},
        cwd=REPO,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}\n{proc.stderr}"
    return proc.stdout


def test_star_etl_job_is_transactional_and_idempotent(spark, tmp_path):
    """The documented two-argument invocation lands every dimension and
    the fact table on commit-log tables; the re-run inserts zero rows
    THROUGH the transactional catalog."""
    wh = str(tmp_path / "star_wh")
    out1 = _run_example("star_etl_job.py", warehouse=wh)
    assert "fact_order_line: inserted=" in out1
    # every warehouse table is a TxTable (commit log present)
    tables = sorted(
        d for d in os.listdir(wh) if os.path.isdir(os.path.join(wh, d))
    )
    assert {"dim_customer", "dim_nation", "dim_part", "fact_order_line"} <= set(tables)
    for tbl in tables:
        assert os.path.isdir(os.path.join(wh, tbl, "_txlog")), tbl
    out2 = _run_example("star_etl_job.py", warehouse=wh)
    for line in out2.splitlines():
        if ": inserted=" in line and "incoming=" in line:
            assert line.rstrip().endswith("inserted=0"), line
    assert "fact_order_line: inserted=0" in out2

    # the committed versions read back consistently from THIS session
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import TxTable

    fact = TxTable(spark, os.path.join(wh, "fact_order_line"))
    assert fact.read().count() > 0
    assert [m["op"] for m in fact.history()][0] == "append"

    # --catalog plain still runs the plain-parquet path
    wh2 = str(tmp_path / "star_wh_plain")
    _run_example("star_etl_job.py", "--catalog", "plain", warehouse=wh2)
    assert not os.path.isdir(os.path.join(wh2, "dim_nation", "_txlog"))


def test_transactional_etl_job_runs_end_to_end(spark, tmp_path):
    """The governed-transaction example: incremental dimension load,
    row-level UPDATE/DELETE, compaction and vacuum as commits, and the
    per-version audit trail, all through TransactionalCatalog."""
    wh = str(tmp_path / "tx_wh")
    _run_example("transactional_etl_job.py", warehouse=wh)
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import TxTable

    tbl = TxTable(spark, os.path.join(wh, "dim_part"))
    ops = [m["op"] for m in tbl.history()]
    # DML/compact commits present in the audit trail. (The initial
    # append may have been vacuumed: this table's small DML commits
    # carry full manifests under the smaller-encoding rule, so vacuum
    # no longer retains a delta replay chain down to version 0.)
    assert "rewrite" in ops
    got = tbl.read()
    assert got.count() > 0
    assert got.filter("Brand = 'Brand#13'").count() == 0  # retired by DELETE


def test_incremental_ingest_job_is_idempotent(tmp_path):
    """The continuous-ingestion example: first run bootstraps the
    MinHash index and the curated table; the re-run pushes the same
    batch through the index dedup and ingests zero new rows — the
    crash-retry idempotence the job exists for. Bookmarks ride the
    transactional catalog (the example's default)."""
    wh = str(tmp_path / "ingest_wh")
    out1 = _run_example("incremental_ingest_job.py", warehouse=wh)
    assert "partitions_touched=" in out1
    n_total = [l for l in out1.splitlines() if "table_total=" in l][-1]
    out2 = _run_example("incremental_ingest_job.py", warehouse=wh)
    line2 = [l for l in out2.splitlines() if "new=" in l][-1]
    assert "new=0," in line2, line2
    n_total2 = [l for l in out2.splitlines() if "table_total=" in l][-1]
    assert n_total.split("table_total=")[1] == n_total2.split("table_total=")[1]


def test_incremental_consumer_job_is_exactly_once(spark, tmp_path):
    """The change-stream consumer example, three runs: each run's
    producer burst is consumed exactly once — one summary row-set per
    producer version in the result table, idempotence state carried in
    the result table's own app_versions map."""
    wh = str(tmp_path / "consumer_wh")
    for _ in range(3):
        _run_example("incremental_consumer_job.py", warehouse=wh)
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import TxTable

    results = TxTable(spark, os.path.join(wh, "type_counts"))
    got = results.read()
    assert sorted(
        r.producer_version
        for r in got.select("producer_version").distinct().collect()
    ) == [0, 1, 2]
    # never a duplicate (version, type) row — replays no-op
    assert (
        got.groupBy("producer_version", "event_type").count()
        .filter("count > 1").count() == 0
    )


def test_curate_documents_job_runs_end_to_end(spark, tmp_path):
    """The batch curation example (quality gate → trigram language
    match → exact + MinHash-LSH dedup → sorted curated write): runs
    clean and lands a non-empty curated table whose rows all carry the
    predicted-equals-labeled language the gate enforces."""
    wh = str(tmp_path / "curate_wh")
    out = _run_example("curate_documents_job.py", warehouse=wh)
    assert "curated " in out and " documents -> " in out
    curated = spark.read.parquet(os.path.join(wh, "curated_documents"))
    n = curated.count()
    assert 0 < n < 600  # the gates must actually drop documents
    assert set(curated.columns) >= {"doc_id", "lang", "source", "text"}
