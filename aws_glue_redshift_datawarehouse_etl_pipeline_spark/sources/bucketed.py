"""Bucketed-table layout: the shuffle-free co-located join.

At 100 TB the dominant cost of a fact-fact or fact-dim join that can't
broadcast is the shuffle of both sides. Spark's bucketing
(``bucketBy(n, keys)`` + ``saveAsTable``) pre-partitions the data ON
DISK by ``hash(keys) % n``: two tables bucketed on the same keys with
the same bucket count join with ZERO exchanges — each task zips bucket
i of both sides. The write pays the shuffle once; every subsequent
join, aggregation, or dedup keyed on the bucket columns reads it back
for free. This is the batch-warehouse analog of the reference's
Redshift DISTKEY placement (redshift/ddl.sql — co-locating the fact
with its join key), re-expressed as a Spark physical layout.

Bucket pruning: an equality filter on the first bucket column scans
1/n of the files. Sort columns within buckets (``sortBy``) additionally
enable merge-join without a per-task sort and row-group skipping.

Local caveat baked into the helpers: bucketed tables must go through
the session catalog (``saveAsTable``) — plain ``.parquet(path)`` writes
ignore ``bucketBy``.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int,
    sort_cols: Sequence[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
    one_file_per_bucket: bool = True,
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog
    table. One shuffle on the bucket columns now; joins and
    aggregations keyed on them are exchange-free afterwards. Choose
    ``num_buckets`` so one bucket of the LARGER table fits an executor
    core's working set (100-500 MB compressed) and use the SAME count
    on every table that joins on these keys — unequal counts fall back
    to a shuffle on one side.

    ``one_file_per_bucket`` (default) repartitions on the bucket
    columns before the write — Spark's bucketed writer otherwise has
    EVERY input task write its own file per bucket it sees, so an
    N-partition input produces up to N x num_buckets small files, and a
    bucket spread over several files disqualifies the table from the
    sort-free merge join (Spark only trusts ``sortBy`` when a bucket is
    exactly one file). The repartition hash-aligns with the bucket
    hash (both Murmur3 pmod num_buckets), so each write task holds
    exactly one bucket: num_buckets files total, sort-free merge reads,
    ~25-30% faster write+join measured at sf0.1 (r15). The trade is
    write-stage parallelism = num_buckets — size num_buckets to the
    working set per the note above and this is moot at scale; pass
    False to keep maximum write parallelism for a layout whose reads
    can re-sort.

    Overwrite is made robust to ORPHANED LOCATIONS: a managed table's
    directory can outlive its catalog entry (new session, dropped
    metastore), and ``saveAsTable`` refuses to adopt it
    (LOCATION_ALREADY_EXISTS). On overwrite, drop the entry and clear
    a stale directory first."""
    if mode == "overwrite":
        spark = df.sparkSession
        q = ".".join("`" + p.replace("`", "``") + "`" for p in table.split("."))
        spark.sql(f"DROP TABLE IF EXISTS {q}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = f"{warehouse.rstrip('/')}/{table.split('.')[-1].lower()}"
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(loc)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(jpath):
            fs.delete(jpath, True)
    if one_file_per_bucket:
        df = df.repartition(num_buckets, *[F.col(c) for c in bucket_cols])
    w = df.write.format(fmt).mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket columns.
    Catalyst detects the matching output partitionings and plans a
    SortMergeJoin with NO Exchange on either side (pinned by
    tests/test_bucketed.py): the join cost is a linear zip of bucket
    files. This is the operator to reach for when the same big-big
    join runs repeatedly — amortize the shuffle into the layout."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def analyze_table(
    spark: SparkSession, table: str, columns: Sequence[str] | None = None
) -> dict:
    """Collect table (and optionally column) statistics for the
    cost-based optimizer: row count + size drive join-side selection
    and broadcast decisions; column min/max/ndv/null counts drive
    selectivity estimates for filter-heavy plans. One scan per ANALYZE
    — schedule it with table maintenance (compaction), not per query.
    Returns the recorded statistics line for observability."""

    def q(ident: str) -> str:
        # backtick-quote each dotted part; identifiers are data here,
        # never raw SQL
        return ".".join("`" + p.replace("`", "``") + "`" for p in ident.split("."))

    tq = q(table)
    spark.sql(f"ANALYZE TABLE {tq} COMPUTE STATISTICS")
    if columns:
        cols = ", ".join(q(c) for c in columns)
        spark.sql(f"ANALYZE TABLE {tq} COMPUTE STATISTICS FOR COLUMNS {cols}")
    row = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {tq}")
        .filter("col_name = 'Statistics'")
        .select("data_type")
        .first()
    )
    return {"table": table, "statistics": row["data_type"] if row else None}
