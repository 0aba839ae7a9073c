"""Scale smoke tests: the heavy operators on a corpus ~10× the largest
testdata slice, built by replicating documents with rewritten ids (the
driver's parquet inputs stay untouched — this is a load test, not an
oracle input). Run with RUN_SCALE_SMOKE=1; skipped by default so the
per-round gate stays fast.

What this pins that sf0.1 cannot: the LSH pipeline and the star rounds
keep near-linear behavior as the corpus grows — a reintroduced
quadratic (all-pairs join, unbounded bucket) blows past the generous
wall-clock guards here long before it would surface at test SF.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SCALE_SMOKE") != "1",
    reason="set RUN_SCALE_SMOKE=1 to run the 10x-corpus load tests",
)


@pytest.fixture(scope="module")
def big_docs(spark):
    base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    copies = [
        base.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.concat(F.col("text"), F.lit(f" replica{i}")).alias("text"),
        )
        for i in range(10)
    ]
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out.repartition(32).persist()


def test_lsh_dedup_scales_near_linearly(spark, big_docs):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import dedup as D

    n = big_docs.count()  # materialize the fixture outside the timer
    assert n == 50_000
    t0 = time.time()
    survivors = D.minhash_lsh_dedup(
        big_docs, "doc_id", "text", verify_threshold=0.8
    ).count()
    elapsed = time.time() - t0
    assert 0 < survivors <= n
    print(f"lsh smoke: {elapsed:.1f}s on 50k docs")
    # sf0.1 (5k docs) runs in ~2 s warm; 10x data through band-bucket
    # joins should stay within ~an order of magnitude, never quadratic
    assert elapsed < 120, f"LSH dedup took {elapsed:.0f}s on 50k docs"


def test_star_components_scale_on_wide_graph(spark, big_docs):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import graph as G

    n = 200_000
    nodes = spark.range(n).select(F.col("id"))
    # 100 chains of 2000 nodes each: diameter 2000, so propagation is
    # out of reach but star rounds stay O(log n)
    edges = (
        spark.range(n - 1)
        .filter((F.col("id") + 1) % 2000 != 0)
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )
    t0 = time.time()
    comps = G.connected_components(
        nodes, edges, driver_threshold=0, algorithm="star", max_iter=25
    )
    k = comps.select("component").distinct().count()
    elapsed = time.time() - t0
    assert k == 100
    print(f"star smoke: {elapsed:.1f}s on {n} nodes")
    assert elapsed < 180, f"star CC took {elapsed:.0f}s on {n} nodes"


def test_txlog_many_commit_read_stays_cheap(spark, tmp_path):
    """200 append commits: snapshot resolution must stay O(versions)
    listing one directory (no per-file recursion), the head read must
    plan a bounded union, and compaction must collapse the accreted
    layout in one commit. Guards: build+read under 240 s wall-clock on
    local[8] — a superlinear manifest or read path blows well past it."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import TxTable

    t0 = time.time()
    root = str(tmp_path / "many_commits")
    t = TxTable(spark, root)
    df = spark.range(100).withColumn("v", F.col("id").cast("double"))
    for i in range(200):
        t.append(df.withColumn("batch", F.lit(i)))
    build_s = time.time() - t0

    t1 = time.time()
    assert t.current_version() == 199
    assert t.read().count() == 20_000
    read_s = time.time() - t1

    t2 = time.time()
    t.compact(num_files=4)
    assert len(t._head_manifest()["files"]) <= 4
    assert t.read().count() == 20_000
    compact_s = time.time() - t2

    swept = t.vacuum(keep_versions=1, retention_hours=0.0)
    assert len(swept) == 200
    total = build_s + read_s + compact_s
    print(f"txlog smoke: build={build_s:.1f}s read={read_s:.1f}s compact={compact_s:.1f}s")
    assert total < 240, f"txlog smoke too slow: {total:.1f}s"
