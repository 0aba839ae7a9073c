"""Runnable training-data curation job over the `documents` table:
quality scoring → language-ID gate → repetition gate → exact dedup →
MinHash-LSH near-dedup → curated write with token accounting.

    python examples/curate_documents_job.py \
        --JOB_NAME curate --src_dir /root/testdata/sf0.001 \
        --warehouse_dir /tmp/curated_warehouse

Every stage is a narrow Column transform or a bounded-shuffle dedup
(operators/dedup.py documents the 100 TB shuffle design per stage);
nothing collects to the driver except the final stats print.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.job import Job, get_resolved_options
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import dedup as D
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import text as X
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import WarehouseCatalog


def main(argv: list[str]) -> None:
    args = get_resolved_options(argv, ["src_dir", "warehouse_dir"])
    spark = get_spark(app_name=args.get("JOB_NAME", "curate-documents"))
    catalog = WarehouseCatalog(spark, args["warehouse_dir"])
    job = Job(catalog)
    job.init(args.get("JOB_NAME", "curate-documents"))

    docs = spark.read.parquet(os.path.join(args["src_dir"], "documents.parquet"))
    n_in = docs.count()

    scored = X.language_id(X.quality_features(docs))
    kept = scored.filter(
        (F.col("quality_score") >= 0.5) & (F.col("lang_pred") == F.col("lang"))
    )
    rep = X.repetition_stats(kept).select("doc_id", "dup_bigram_fraction")
    kept = kept.join(rep, "doc_id").filter(F.col("dup_bigram_fraction") < 0.10)
    exact = D.exact_dedup(kept, "doc_id")
    near = D.minhash_lsh_dedup(exact, "doc_id", "text", verify_threshold=0.8)

    curated = near.select(
        "doc_id", "lang", "source", "text", F.col("n_tokens").cast("long")
    )
    catalog.write_table(curated, "curated_documents", mode="overwrite", sort_keys=["doc_id"])

    stats = (
        curated.groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
        .orderBy("lang", "source")
    )
    n_out = 0
    for r in stats.collect():
        n_out += r.n_docs
        print(f"{r.lang}/{r.source}: docs={r.n_docs} tokens={r.total_tokens}")
    print(f"curated {n_out}/{n_in} documents -> {catalog._path('curated_documents')}")
    job.commit()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
