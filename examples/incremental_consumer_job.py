"""Runnable incremental-consumer job: exactly-once consumption of a
transactional table's change stream (sources/txlog.py), the pattern a
downstream aggregator runs on a schedule against a continuously-ingested
upstream.

    python examples/incremental_consumer_job.py \
        --JOB_NAME consumer --src_dir /root/testdata/sf0.001 \
        --warehouse_dir /tmp/consumer_demo

Each run: the producer table receives one more burst of events, then the
consumer (1) looks up the last producer version it processed from the
RESULT table's own idempotence map — no side-channel state file to lose,
(2) reads only the files added since (`read_added_since`: manifest-only
discovery, O(new data) however large the table), (3) appends the burst's
per-type counts to the result table with `app_id=consumer,
app_version=<producer version>` — so a crash between processing and
commit replays harmlessly: the replayed commit no-ops and returns the
original version. Run it five times; the result table has exactly one
summary row-set per burst, never a duplicate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.job import get_logger, get_resolved_options
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.queries import t
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import TxTable

CONSUMER_ID = "event-type-counter"


def main() -> None:
    args = get_resolved_options(sys.argv, ["src_dir", "warehouse_dir"])
    spark = get_spark(
        app_name=args.get("JOB_NAME", "consumer"), cpus=8, shuffle_partitions=8
    )
    log = get_logger(args.get("JOB_NAME", "consumer"))

    producer = TxTable(spark, os.path.join(args["warehouse_dir"], "events_raw"))
    results = TxTable(spark, os.path.join(args["warehouse_dir"], "type_counts"))

    # -- producer side: one more ingest burst (10% of events per run) ----
    burst_no = producer.current_version() + 1 if producer.exists() else 0
    ev = t(spark, args["src_dir"], "events")
    burst = ev.filter(F.pmod(F.col("event_id"), F.lit(10)) == burst_no % 10)
    producer.append(burst.coalesce(2))
    log.info(f"producer burst {burst_no}: +{burst.count()} events "
             f"(now v{producer.current_version()})")

    # -- consumer side: exactly-once incremental aggregation ------------
    # last processed producer version lives in the RESULT table's own
    # app_versions idempotence map — crash-safe, no side-channel state
    head = results._head_manifest() if results.exists() else None
    rec = ((head or {}).get("app_versions") or {}).get(CONSUMER_ID)
    last = rec[0] if rec else -1
    current = producer.current_version()
    if current <= last:
        log.info("nothing new to consume")
    else:
        fresh = (
            producer.read_added_since(last)
            if last >= 0
            else producer.read()
        )
        summary = (
            fresh.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("producer_version", F.lit(current))
        )
        v = (
            results.begin(app_id=CONSUMER_ID, app_version=current)
            .append(summary)
            .commit()
        )
        log.info(f"consumed producer v{last + 1}..v{current} -> results v{v}")

    # -- audit: one row-set per burst, replays included ------------------
    got = (
        results.read()
        .groupBy("producer_version")
        .agg(F.sum("n").alias("events_counted"))
        .orderBy("producer_version")
    )
    for r in got.collect():
        log.info(f"producer_version={r.producer_version} "
                 f"events_counted={r.events_counted}")


if __name__ == "__main__":
    main()
