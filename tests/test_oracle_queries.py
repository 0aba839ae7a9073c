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
    """HLL estimate must land within ~3×rsd of the exact count."""
    q.register_all()
    approx = {
        r.c_mktsegment: r.approx_customers
        for r in q.QUERIES["approx_distinct_customers"](spark, sf_dir).collect()
    }
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    exact = {
        r.c_mktsegment: r.n
        for r in o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(__import__("pyspark.sql.functions", fromlist=["F"]).countDistinct("o_custkey").alias("n"))
        .collect()
    }
    for seg, n in exact.items():
        assert abs(approx[seg] - n) <= max(3, 0.06 * n), seg


def test_approx_percentile_brackets_exact(spark, sf_dir):
    q.register_all()
    rows = q.QUERIES["approx_percentile_prices"](spark, sf_dir).collect()
    from pyspark.sql import functions as F
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for r in rows:
        p50, p95 = r.p50_p95
        exact = (
            o.filter(F.col("o_orderpriority") == r.o_orderpriority)
            .agg(F.expr("percentile(o_totalprice, array(0.5, 0.95))").alias("p"))
            .first()
            .p
        )
        assert abs(p50 - exact[0]) <= 0.02 * max(1.0, exact[0])
        assert abs(p95 - exact[1]) <= 0.02 * max(1.0, exact[1])
