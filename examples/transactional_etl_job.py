"""Runnable transactional-warehouse job: the star-loader dimension flow
on a commit-log catalog (sources/txlog.py), so every load is an atomic,
time-travelable version — the reference's governed-transaction sink
shape (context.py:676-683) end to end.

    python examples/transactional_etl_job.py \
        --JOB_NAME tx_etl --src_dir /root/testdata/sf0.001 \
        --warehouse_dir /tmp/tx_warehouse

Each run: loads the part dimension (anti-join incremental, zero rows on
a re-run), upserts a price revision through a transactional MERGE,
compacts the accreted small files as a commit, vacuums unreferenced
data, and prints the commit history with row counts per version — the
audit trail a plain-parquet warehouse cannot give.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.job import get_logger, get_resolved_options
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.plans import (
    DimensionSpec,
    load_dimension,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
    TransactionalCatalog,
)

DIM_PART = DimensionSpec(
    table="dim_part",
    mappings=[
        ("p_partkey", "long", "PartKey", "int"),
        ("p_name", "PartAlternateKey", "string"),
        ("p_brand", "Brand"),
        ("p_retailprice", "double", "RetailPrice", "double"),
    ],
    keys=["PartKey"],
    sort_keys=["PartKey"],
)


def main() -> None:
    args = get_resolved_options(sys.argv, ["src_dir", "warehouse_dir"])
    spark = get_spark(
        app_name=args.get("JOB_NAME", "tx-etl"), cpus=8, shuffle_partitions=8
    )
    log = get_logger(args.get("JOB_NAME", "tx-etl"))

    cat = TransactionalCatalog(spark, args["warehouse_dir"])
    part = spark.read.parquet(os.path.join(args["src_dir"], "part.parquet"))

    # 1. incremental dimension load — a transaction per run, no-op on replay
    res = load_dimension(part, DIM_PART, cat)
    log.info(f"dim_part: incoming={res.incoming} inserted={res.inserted}")

    tbl = cat.table("dim_part")

    # 2. price revision as row-level UPDATE: +2% on one brand, committed
    #    atomically as a minimal-file rewrite — only files containing
    #    Brand#11 rows are rewritten, the rest carry by reference;
    #    readers see old or new prices, never a mix
    v = tbl.update(
        F.col("Brand") == "Brand#11",
        {"RetailPrice": F.col("RetailPrice") * 1.02},
    )
    log.info(f"price revision committed as version {v}")

    # 2b. retire a discontinued brand with row-level DELETE (same
    #     minimal-rewrite machinery; a no-match delete is a no-op
    #     version, so replays don't churn the log)
    v = tbl.delete(F.col("Brand") == "Brand#13")
    log.info(f"brand retirement committed as version {v}")

    # 3. maintenance as commits: compact the accreted files, then drop
    #    data no retained version references
    v = tbl.compact()
    swept = tbl.vacuum(keep_versions=3, retention_hours=0.0)
    log.info(f"compacted at version {v}; vacuum removed {len(swept)} stages")

    # 4. the audit trail: every version stays queryable until vacuumed
    for h in tbl.history():
        try:
            n = tbl.read(version=h["version"]).count()
        except FileNotFoundError:
            n = "vacuumed"
        log.info(f"v{h['version']} op={h['op']} rows={n}")


if __name__ == "__main__":
    main()
