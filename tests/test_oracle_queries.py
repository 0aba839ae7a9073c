"""Every registered query must match its DuckDB oracle exactly at sf0.001
(the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from aws_glue_redshift_datawarehouse_etl_pipeline_spark import queries as q
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.oracle import compare_query

q.register_all()
ORACLE_CASES = sorted(q.ORACLE)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(spark, sf_dir, name):
    res = compare_query(spark, sf_dir, name, q.QUERIES[name], q.ORACLE[name])
    assert res.ok, f"{name}: {res.detail} (rows {res.rows_spark}/{res.rows_oracle}, approx={res.approx_match})"


def test_every_query_runs(spark, sf_dir):
    q.register_all()
    for name, fn in q.QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_approx_distinct_within_rsd(spark, sf_dir):
    """The query's own invariant column: HLL estimate within 3×rsd of
    exact for every segment (the exact count itself is oracle-checked)."""
    q.register_all()
    rows = q.QUERIES["approx_distinct_customers"](spark, sf_dir).collect()
    assert rows and all(r.approx_ok for r in rows)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    """Each percentile_approx estimate must land between the exact
    percentiles at q±0.01 (the query's own invariant columns)."""
    q.register_all()
    rows = q.QUERIES["approx_percentile_prices"](spark, sf_dir).collect()
    assert rows and all(r.p50_ok and r.p95_ok for r in rows)
