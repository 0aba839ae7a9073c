"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship star query at sf0.001;
``queries()`` / ``oracle_sql()`` expose the full oracle-checked
registry from the engine package (one entry per implemented operator
from SURVEY.md §2).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_glue_redshift_datawarehouse_etl_pipeline_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.QUERIES["star_revenue_by_nation"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _q.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each oracle-checked query."""
    return _q.all_oracle_sql()
