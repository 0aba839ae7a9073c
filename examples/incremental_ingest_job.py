"""Runnable continuous-ingestion job: each run dedups one new batch of
documents against the persisted MinHash index (never re-shingling the
already-curated corpus), skew-profiles the batch's join keys, merges
survivors into a partitioned warehouse table rewriting only the
touched partitions, and Z-orders the written slice for multi-column
data skipping.

    python examples/incremental_ingest_job.py \
        --JOB_NAME ingest --src_dir /root/testdata/sf0.001 \
        --warehouse_dir /tmp/ingest_warehouse

The first run bootstraps the index from an empty corpus; re-running
the same command ingests the same batch again and drops every row as
a duplicate — the idempotence a crash-retried ingest pipeline needs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.job import Job, get_resolved_options
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.diagnostics import (
    skew_profile,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.incremental import (
    build_minhash_index,
    incremental_minhash_dedup,
    write_minhash_index,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.joins import (
    merge_upsert_into_path,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.layout import (
    zorder_layout,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
    TransactionalCatalog,
)


def main(argv: list[str]) -> None:
    args = get_resolved_options(argv, ["src_dir", "warehouse_dir"])
    spark = get_spark(app_name=args.get("JOB_NAME", "incremental-ingest"))
    # the governed catalog is the default front door: job bookmarks
    # commit transactionally (a crash between data write and bookmark
    # commit leaves the previous watermark, and the idempotent dedup
    # absorbs the re-read)
    catalog = TransactionalCatalog(spark, args["warehouse_dir"])
    job = Job(catalog)
    job.init(args.get("JOB_NAME", "incremental-ingest"))

    index_path = os.path.join(args["warehouse_dir"], "minhash_index")
    table_path = os.path.join(args["warehouse_dir"], "documents_curated")

    batch = spark.read.parquet(os.path.join(args["src_dir"], "documents.parquet"))
    n_in = batch.count()

    # 1. know the shuffle before running it
    prof = skew_profile(batch, "source").first()
    print(
        f"[ingest] batch={n_in} rows, source keys={prof['n_keys']}, "
        f"max_share={prof['max_share']:.3f}, p99/p50={prof['p99_n']}/{prof['p50_n']}"
    )

    # 2. dedup against the persisted index (bootstrap it when absent)
    if not os.path.isdir(index_path):
        empty = batch.limit(0)
        write_minhash_index(build_minhash_index(empty, "doc_id"), index_path)
    survivors = incremental_minhash_dedup(
        spark, batch, index_path, "doc_id"
    ).withColumn("ingest_bucket", F.pmod(F.xxhash64("doc_id"), F.lit(16)))
    n_new = survivors.count()

    # 3. merge only the touched partitions of the curated table
    if not os.path.isdir(table_path):
        zorder_layout(survivors, ["doc_id", "n_chars"], num_partitions=4).write.partitionBy(
            "ingest_bucket"
        ).parquet(table_path)
        touched = ["(bootstrap)"]
    else:
        touched = merge_upsert_into_path(
            spark, table_path, survivors, ["doc_id"], ["ingest_bucket"]
        )

    n_total = spark.read.parquet(table_path).count()
    print(
        f"[ingest] new={n_new}, dropped_as_dup={n_in - n_new}, "
        f"partitions_touched={len(touched)}, table_total={n_total}"
    )
    job.commit()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
