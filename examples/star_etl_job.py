"""Runnable ETL job mirroring the reference pipeline's flow
(/root/reference/pipeline.py) Spark-first: parse args → init job →
incremental dimension loads → fact build with composite-key dedup →
commit bookmarks.

Run (any sf dir):

    python examples/star_etl_job.py \
        --JOB_NAME demo --src_dir /root/testdata/sf0.001 \
        --warehouse_dir /tmp/engine_warehouse

Re-running inserts zero new rows (the idempotence invariant the
reference's anti-join dedup exists for); rows added to the source
after a run are picked up incrementally on the next one.

The warehouse is GOVERNED by default: tables live on the commit-log
format (``TransactionalCatalog``), so every load is an atomic,
time-travelable version, a crashed run leaves the previous snapshot,
and bookmarks commit transactionally. Pass ``--catalog plain`` for
the plain-parquet ``WarehouseCatalog``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.job import Job, get_resolved_options
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.plans.star_loader import (
    DimensionSpec,
    FactSpec,
    load_dimension,
    load_fact,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import WarehouseCatalog
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
    TransactionalCatalog,
)

DIM_SPECS = [
    DimensionSpec(
        table="dim_customer",
        mappings=[
            ("c_custkey", "bigint", "customer_key", "bigint"),
            ("c_name", "string", "customer_name", "string"),
            ("c_mktsegment", "string", "market_segment", "string"),
            ("c_nationkey", "int", "nation_key", "int"),
        ],
        keys=["customer_key"],
        sort_keys=["customer_key"],
    ),
    DimensionSpec(
        table="dim_nation",
        mappings=[
            ("n_nationkey", "int", "nation_key", "int"),
            ("n_name", "string", "nation_name", "string"),
            ("n_regionkey", "int", "region_key", "int"),
        ],
        keys=["nation_key"],
        sort_keys=["nation_key"],
    ),
    DimensionSpec(
        table="dim_part",
        mappings=[
            ("p_partkey", "bigint", "part_key", "bigint"),
            ("p_name", "string", "part_name", "string"),
            ("p_brand", "string", "brand", "string"),
            ("p_retailprice", "double", "retail_price", "double"),
        ],
        keys=["part_key"],
        sort_keys=["part_key"],
    ),
]

FACT_SPEC = FactSpec(
    table="fact_order_line",
    left_keys=["l_orderkey"],
    right_keys=["o_orderkey"],
    mappings=[
        ("l_orderkey", "bigint", "order_key", "bigint"),
        ("l_linenumber", "int", "line_number", "int"),
        ("l_partkey", "bigint", "part_key", "bigint"),
        ("o_custkey", "bigint", "customer_key", "bigint"),
        ("l_quantity", "double", "quantity", "double"),
        ("l_extendedprice", "double", "extended_price", "double"),
        ("o_orderdate", "timestamp", "order_ts", "timestamp"),
    ],
    anti_keys=["order_key", "line_number", "part_key", "customer_key"],
    sort_keys=["order_key"],
    broadcast_right=False,
)

DIM_SOURCES = {"dim_customer": "customer", "dim_nation": "nation", "dim_part": "part"}


def main(argv: list[str]) -> None:
    args = get_resolved_options(argv, ["src_dir", "warehouse_dir"])
    spark = get_spark(app_name=args.get("JOB_NAME", "star-etl"))
    # governed (commit-log) tables are the front door; --catalog plain
    # opts down to the plain-parquet warehouse (optional flag, so the
    # documented two-argument invocation keeps working)
    plain = any(
        a == "--catalog" and argv[i + 1 : i + 2] == ["plain"]
        for i, a in enumerate(argv)
    )
    catalog = (
        WarehouseCatalog(spark, args["warehouse_dir"])
        if plain
        else TransactionalCatalog(spark, args["warehouse_dir"])
    )
    job = Job(catalog)
    job.init(args.get("JOB_NAME", "star-etl"))

    for spec in DIM_SPECS:
        src = spark.read.parquet(
            os.path.join(args["src_dir"], f"{DIM_SOURCES[spec.table]}.parquet")
        )
        res = load_dimension(src, spec, catalog)
        print(f"{res.table}: incoming={res.incoming} inserted={res.inserted}")

    lineitem = spark.read.parquet(os.path.join(args["src_dir"], "lineitem.parquet"))
    orders = spark.read.parquet(os.path.join(args["src_dir"], "orders.parquet"))
    res = load_fact(lineitem, orders, FACT_SPEC, catalog)
    print(f"{res.table}: inserted={res.inserted}")

    job.record("orders", orders, "o_orderdate")
    job.commit()
    print("bookmark orders =", catalog.get_bookmark("orders"))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
