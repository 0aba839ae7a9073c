"""Bucketed-layout tests: the co-located join must plan with zero
exchanges, and bucket pruning must reach the scan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.bucketed import (
    cobucketed_join,
    write_bucketed_table,
)


@pytest.fixture()
def bucketed_pair(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem, "b_lineitem", ["l_orderkey"], 8, sort_cols=["l_orderkey"]
    )
    yield orders, lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_cobucketed_join_has_no_exchange(spark, bucketed_pair):
    """Same keys, same bucket count: the join must zip bucket files —
    any Exchange in the plan means the layout was wasted. Broadcast is
    disabled for the assertion so the shuffle-free-ness comes from
    bucketing, not from the small test tables."""
    orders, lineitem = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("b_lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
        joined = spark.table("b_orders").join(j, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        # and the result matches the plain shuffle join
        expect = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert joined.count() == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cobucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    """A groupBy on the bucket column reuses the on-disk partitioning:
    no Exchange before the final aggregate."""
    agg = (
        spark.table("b_lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_cobucketed_join_helper_matches(spark, bucketed_pair, sf_dir):
    orders, lineitem = bucketed_pair
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem_renamed",
        ["o_orderkey"],
        8,
    )
    try:
        got = cobucketed_join(
            spark, "b_orders", "b_lineitem_renamed", ["o_orderkey"]
        ).count()
        expect = orders.join(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
        ).count()
        assert got == expect
    finally:
        spark.sql("DROP TABLE IF EXISTS b_lineitem_renamed")


def test_bucketed_write_one_file_per_bucket(spark, sf_dir, tmp_path):
    """r15 optimization pin: the default write repartitions on the
    bucket columns first, so an N-partition input yields exactly
    num_buckets data files (not up to N x num_buckets) — the layout
    Spark requires before it trusts sortBy for the sort-free merge
    join. A bucket spread over several files silently re-sorts every
    read."""
    import glob

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").repartition(16)
    write_bucketed_table(
        orders, "b_onefile", ["o_orderkey"], 4, sort_cols=["o_orderkey"]
    )
    try:
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = f"{warehouse.rstrip('/')}/b_onefile".replace("file:", "")
        files = [
            f for f in glob.glob(f"{loc}/*")
            if not f.rsplit("/", 1)[-1].startswith(("_", "."))
        ]
        assert len(files) == 4, files
        # and the table still round-trips
        assert spark.table("b_onefile").count() == orders.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_onefile")


def test_analyze_table_records_stats_for_cbo(spark, bucketed_pair):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.bucketed import (
        analyze_table,
    )

    stats = analyze_table(spark, "b_orders", columns=["o_orderkey"])
    assert stats["statistics"] and "rows" in stats["statistics"]
    # column-level stats exist (ndv / min / max recorded)
    desc = spark.sql("DESCRIBE EXTENDED b_orders o_orderkey").collect()
    info = {r.info_name: r.info_value for r in desc}
    assert info.get("distinct_count") not in (None, "NULL")
