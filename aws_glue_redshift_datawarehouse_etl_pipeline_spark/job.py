"""Job lifecycle: argv parsing and bookmark commit semantics.

Mirrors the reference's surface (/root/reference/awsglue/utils.py:79-159
``getResolvedOptions`` and /root/reference/awsglue/job.py:37-48
``Job.init/commit/isInitialized``) on plain argparse + the engine's
WarehouseCatalog high-watermark bookmarks. Reserved argument names and
the TempDir alias are preserved so reference job scripts port verbatim.
"""

from __future__ import annotations

import argparse
from typing import Sequence

from pyspark.sql import DataFrame

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import WarehouseCatalog

# Reserved names the reference rejects as user options and always
# accepts on the command line (utils.py:96-123).
RESERVED_OPTIONS = {
    "JOB_NAME",
    "TempDir",
    "temp_dir",
    "job_bookmark_option",
    "encryption_type",
}


class JobArgumentError(ValueError):
    pass


def get_resolved_options(args: Sequence[str], options: Sequence[str]) -> dict[str, str]:
    """Parse ``--name value`` pairs for the requested option names plus
    the reserved set. ``TempDir``/``temp_dir`` alias each other
    (utils.py:124-128); requesting a reserved name raises, matching the
    reference's guard."""
    clash = set(options) & RESERVED_OPTIONS
    if clash:
        raise JobArgumentError(f"options must not include reserved names: {sorted(clash)}")
    parser = argparse.ArgumentParser(add_help=False)
    for name in options:
        parser.add_argument(f"--{name}", required=True)
    for name in RESERVED_OPTIONS:
        parser.add_argument(f"--{name}", required=False, default=None)
    ns, _ = parser.parse_known_args(list(args))
    resolved = {k: v for k, v in vars(ns).items() if v is not None}
    if "TempDir" in resolved and "temp_dir" not in resolved:
        resolved["temp_dir"] = resolved["TempDir"]
    if "temp_dir" in resolved and "TempDir" not in resolved:
        resolved["TempDir"] = resolved["temp_dir"]
    return resolved


class Job:
    """Bookmark lifecycle: ``init`` names the job, ``commit`` persists
    every watermark recorded during the run (the reference's
    job-bookmark checkpoint enabling incremental reads on the next
    run). Watermarks are buffered so a failed job commits nothing."""

    def __init__(self, catalog: WarehouseCatalog):
        self.catalog = catalog
        self.job_name: str | None = None
        self._pending: list[tuple[str, DataFrame, str]] = []

    def init(self, job_name: str, args: dict | None = None) -> None:
        self.job_name = job_name

    def is_initialized(self) -> bool:
        return self.job_name is not None

    def record(self, source: str, df: DataFrame, watermark_col: str) -> None:
        """Buffer a watermark to persist at commit."""
        self._pending.append((source, df, watermark_col))

    def commit(self) -> None:
        if not self.is_initialized():
            raise RuntimeError("Job.commit before init")
        for source, df, col in self._pending:
            self.catalog.commit_bookmark(source, df, col)
        self._pending.clear()


def get_logger(name: str = "glue_job") -> "logging.Logger":
    """Job-scoped logger (GlueContext.get_logger parity,
    /root/reference/awsglue/context.py — the reference returns a
    py4j-backed JVM logger; stdlib logging is the Spark-idiomatic
    equivalent and survives driver/executor log aggregation). Idempotent:
    repeated calls return the same configured logger."""
    import logging

    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger
