"""Physical-plan regression tests: the 100 TB design claims in
SCALE.md, asserted against what Catalyst actually plans at test SF.

Each test pins the plan *shape* (which operators appear), not costs:
broadcast where a dimension is small, pushed filters at the parquet
scan, two-phase aggregation, top-k without a global sort, and the
absence of nested-loop joins in the extension operators. If a future
change regresses one of these, the query still returns correct rows —
only these tests catch the plan degrading.
"""

from __future__ import annotations

import re

import pytest

from aws_glue_redshift_datawarehouse_etl_pipeline_spark import queries as q

q.register_all()


def plan(spark, sf_dir, name: str) -> str:
    return q.QUERIES[name](spark, sf_dir)._jdf.queryExecution().executedPlan().toString()


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    s = plan(spark, sf_dir, "star_revenue_by_nation")
    assert "BroadcastHashJoin" in s  # dims broadcast: no shuffle of lineitem for dims
    assert "SortMergeJoin" not in s
    assert s.count("HashAggregate") >= 2  # partial (map-side) + final aggregation


def test_pricing_summary_pushes_filter_and_prunes_columns(spark, sf_dir):
    s = plan(spark, sf_dir, "pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in s
    # column pruning: the scan must not read all 16 lineitem columns
    read_schema = next(ln for ln in s.splitlines() if "ReadSchema" in ln)
    assert "l_comment" not in read_schema and "l_partkey" not in read_schema
    assert s.count("HashAggregate") >= 2  # partial (map-side) + final aggregation


def test_topk_avoids_global_sort(spark, sf_dir):
    s = plan(spark, sf_dir, "top_orders_by_value")
    assert "TakeOrderedAndProject" in s  # per-partition heaps + driver merge
    assert "Exchange rangepartitioning" not in s  # no full sort shuffle


def test_antijoin_is_hash_not_nested_loop(spark, sf_dir):
    s = plan(spark, sf_dir, "antijoin_composite_lineitem")
    assert "LeftAnti" in s
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s


def test_asof_join_plans_without_join_operator(spark, sf_dir):
    s = plan(spark, sf_dir, "asof_purchase_last_click")
    assert "Join" not in s  # union + single window pass
    assert "Window" in s


def test_range_join_plans_as_hash_join(spark, sf_dir):
    s = plan(spark, sf_dir, "range_join_error_context")
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s


def test_merge_upsert_single_pass(spark, sf_dir):
    s = plan(spark, sf_dir, "merge_upsert_orders")
    assert "LeftAnti" in s  # anti + union, not a full outer join
    assert "FullOuter" not in s


@pytest.mark.parametrize("name", ["token_count_documents", "text_quality_scores"])
def test_text_ops_are_codegen_not_python(spark, sf_dir, name):
    s = plan(spark, sf_dir, name)
    # pure Column expressions: no Python worker in the hot path
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s
    assert "FileScan parquet" in s  # …directly over the vectorized scan


def test_cosine_topk_uses_partition_heaps(spark, sf_dir):
    s = plan(spark, sf_dir, "embedding_cosine_topk")
    assert "TakeOrderedAndProject" in s  # no global sort for top-k
    assert "Exchange rangepartitioning" not in s


def test_spread_small_scan_spreads_only_when_under_partitioned(spark, sf_dir):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import (
        spread_small_scan,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    spread = spread_small_scan(docs, "doc_id")
    assert spread.rdd.getNumPartitions() == target
    # rows unchanged, and an already-wide frame passes through untouched
    assert spread.count() == docs.count()
    wide = docs.repartition(target + 4)
    assert spread_small_scan(wide, "doc_id") is wide


def test_snapshot_diff_joins_on_fingerprints_not_rows(spark, sf_dir):
    s = plan(spark, sf_dir, "snapshot_diff_orders")
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    # the only join input columns are key + md5 fingerprint, never the
    # wide compared columns
    assert "FullOuter" in s or "SortMergeJoin" in s or "ShuffledHashJoin" in s


def test_funnel_has_no_cartesian_and_stays_user_keyed(spark, sf_dir):
    s = plan(spark, sf_dir, "funnel_view_click_purchase")
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s


def test_minhash_lsh_dedup_never_plans_all_pairs(spark, sf_dir):
    """The LSH pipeline's only wide stages are band-bucket equi-joins
    and the verify joins on candidate ids — a CartesianProduct or
    nested-loop join anywhere means someone reintroduced an all-pairs
    path that cannot survive 100x data."""
    for name in ("minhash_lsh_dedup_portable", "minhash_lsh_dedup_documents"):
        s = plan(spark, sf_dir, name)
        assert "CartesianProduct" not in s, name
        assert "BroadcastNestedLoopJoin" not in s, name


def test_bucketed_near_dup_pairs_stay_bucket_local(spark, sf_dir):
    """embedding_near_dup_pairs_bucketed must generate candidates
    bucket-locally — one Arrow group per IVF bucket feeding the numpy
    GEMM prefilter (FlatMapGroupsInPandas keyed on the bucket), never a
    cross-bucket or all-pairs join. The exact-decimal cosine then joins
    vectors back by id for the candidate survivors only."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import dedup as D

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = D.embedding_near_dup_pairs_bucketed(emb, threshold=0.4, num_buckets=4)
    s = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    assert "FlatMapGroupsInPandas" in s, "per-bucket GEMM stage missing"
    # the Arrow grouping must be keyed on the bucket column so pair
    # work is (n/B)^2 * B, not n^2
    gp = next(ln for ln in s.splitlines() if "FlatMapGroupsInPandas" in ln)
    assert "b#" in gp or "[b" in gp, gp


def test_contamination_check_is_inverted_index_join(spark, sf_dir):
    """The cross-corpus overlap must plan as shingle-keyed equi-joins —
    an all-pairs plan here would be quadratic in corpus size."""
    s = plan(spark, sf_dir, "contamination_check_documents")
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s
    # the stop-shingle cap must be a map-side-combinable groupBy count
    # plus a semi-join, never a Window over the shingle key — a window
    # hands one reducer a hot shingle's entire postings list before the
    # filter can drop it. Window.partitionBy appears in plans as a
    # `Window [...]` node with the shingle in its partition spec.
    assert not re.search(r"Window \[.*\bg\b", s), "shingle-keyed Window in plan"
    assert "LeftSemi" in s, "stop-shingle cap should be a left-semi join"


def test_training_order_avoids_global_sort_and_single_partition_window(spark, sf_dir):
    """First-k of the deterministic order must plan as per-partition
    heaps (TakeOrderedAndProject), not a full range-exchange sort or a
    single-partition window."""
    s = plan(spark, sf_dir, "training_order_documents")
    assert "TakeOrderedAndProject" in s
    assert "Window" not in s


def test_token_budget_single_group_keyed_window(spark, sf_dir):
    """The running-sum cap is one window stage partitioned by the
    group column — partition-by-nothing would serialize the corpus."""
    s = plan(spark, sf_dir, "token_budget_per_source")
    assert s.count("Window") == 1
    wline = next(ln for ln in s.splitlines() if "Window" in ln)
    assert "source" in wline


def test_pack_sequences_is_arrow_grouped_map(spark, sf_dir):
    """Packing must reach Python exactly once, as a grouped-map Arrow
    stage keyed on the shard — everything upstream stays JVM-side."""
    s = plan(spark, sf_dir, "pack_sequences_documents")
    assert "FlatMapGroupsInPandas" in s or "FlatMapGroupsInArrow" in s
    assert "BatchEvalPython" not in s  # no row-at-a-time Python


def test_shipping_priority_broadcasts_customer_and_heaps_topk(spark, sf_dir):
    """Q3 shape: filtered customer side broadcasts, top-10 plans as
    per-partition heaps, never a global sort."""
    s = plan(spark, sf_dir, "shipping_priority_top10")
    assert "BroadcastHashJoin" in s
    assert "TakeOrderedAndProject" in s
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def test_returned_revenue_filter_reaches_lineitem_scan(spark, sf_dir):
    """Q10 shape: the returnflag predicate must push to the parquet
    scan; top-20 via partition heaps."""
    s = plan(spark, sf_dir, "returned_revenue_by_customer")
    assert "TakeOrderedAndProject" in s
    scan_lines = [ln for ln in s.splitlines() if "lineitem" in ln and "PushedFilters" in ln]
    assert any("l_returnflag" in ln for ln in scan_lines), scan_lines or s


def test_q5_shape_broadcasts_small_sides_no_nested_loop(spark, sf_dir):
    """local_supplier_volume_by_nation: supplier and nation broadcast
    into the fact-first join; the nation-equality condition folds into
    a hash join, never a nested-loop or cartesian plan."""
    s = plan(spark, sf_dir, "local_supplier_volume_by_nation")
    assert s.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert s.count("HashAggregate") >= 2


def test_q12_shape_pushes_date_range_to_scan(spark, sf_dir):
    """returnflag_priority_counts: the one-window shipdate range
    reaches the lineitem parquet scan as pushed filters, and the scan
    reads only the three columns the query needs."""
    s = plan(spark, sf_dir, "returnflag_priority_counts")
    assert "PushedFilters: [IsNotNull(l_shipdate)" in s
    assert "GreaterThanOrEqual(l_shipdate" in s and "LessThan(l_shipdate" in s
    read_schema = next(
        ln for ln in s.splitlines() if "ReadSchema" in ln and "l_shipdate" in ln
    )
    assert "l_extendedprice" not in read_schema and "l_partkey" not in read_schema


def test_repeated_span_plans_without_pairwise_join(spark, sf_dir):
    """Substring dedup must never form document pairs: the only joins
    are the window-content semi-join and the final per-doc left join —
    no nested-loop, no cartesian, and the island merge windows over the
    marked set."""
    s = plan(spark, sf_dir, "repeated_span_stats_documents")
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert "LeftSemi" in s
    assert "Window" in s  # gaps-and-islands runs as window functions


def test_semantic_dedup_survivors_is_anti_join_shaped(spark, sf_dir):
    """Survivor selection is a left-anti on the id — never a pairwise
    re-comparison of survivors."""
    s = plan(spark, sf_dir, "semantic_dedup_survivors")
    assert "LeftAnti" in s
    assert "CartesianProduct" not in s


def test_semantic_dedup_production_is_anti_join_shaped(spark, sf_dir):
    """The r14 benched production row keeps the same survivor shape."""
    s = plan(spark, sf_dir, "semantic_dedup_production")
    assert "LeftAnti" in s
    assert "CartesianProduct" not in s


def test_q4_shape_semi_join_carries_key_only(spark, sf_dir):
    s = plan(spark, sf_dir, "order_priority_exists")
    assert "LeftSemi" in s
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    # the EXISTS probe side reads ONLY the join key + filter column
    li_schema = next(
        ln for ln in s.splitlines()
        if "ReadSchema" in ln and "lineitem" in ln
    )
    assert "l_orderkey" in li_schema and "l_extendedprice" not in li_schema


def test_q16_shape_anti_join_and_pushed_part_filters(spark, sf_dir):
    s = plan(spark, sf_dir, "parts_supplier_counts")
    assert "LeftAnti" in s
    assert "In(p_size" in s  # size IN-list pushed to the part scan
    assert "CartesianProduct" not in s


def test_q18_shape_scans_lineitem_once(spark, sf_dir):
    """The IN-subquery aggregate is reused, so the fact table appears
    exactly once in the plan — the literal translation scans it twice."""
    s = plan(spark, sf_dir, "large_order_customers")
    assert s.count("lineitem.parquet") == 1
    assert "TakeOrderedAndProject" in s


def test_q21_shape_single_grouped_pass_over_lineitem(spark, sf_dir):
    """EXISTS + NOT EXISTS collapse into ONE grouped scan of lineitem
    (vs three scans + two semi-join shuffles in the literal form)."""
    s = plan(spark, sf_dir, "sole_problem_supplier")
    assert s.count("lineitem.parquet") == 1
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def test_q19_shape_disjunct_envelopes_reach_both_scans(spark, sf_dir):
    s = plan(spark, sf_dir, "disjunctive_part_revenue")
    li_schema = next(
        ln for ln in s.splitlines() if "PushedFilters" in ln and "l_quantity" in ln
    )
    assert "GreaterThanOrEqual(l_quantity,1.0)" in li_schema
    part_line = next(
        ln for ln in s.splitlines() if "PushedFilters" in ln and "p_brand" in ln
    )
    assert "In(p_brand" in part_line


def test_q17_shape_brand_filter_precedes_per_part_average(spark, sf_dir):
    """The correlated average is computed only over the brand's parts:
    the broadcast brand join must sit BELOW the per-part aggregate, so
    lineitem rows of other brands never reach it."""
    s = plan(spark, sf_dir, "small_quantity_revenue")
    assert "BroadcastHashJoin" in s
    assert "CartesianProduct" not in s
    # part's brand filter is pushed to its scan
    assert "EqualTo(p_brand,Brand#23)" in s


def test_q7_shape_broadcasts_nations_single_fact_scan(spark, sf_dir):
    """volume_shipping_nations: both nation sides (and supplier/
    customer bridges) broadcast around one lineitem pass — the
    bilateral pair condition folds into hash joins, never a
    nested-loop, and the fact is never shuffled for a dimension."""
    s = plan(spark, sf_dir, "volume_shipping_nations")
    assert s.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in s
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert s.count("Scan parquet") == s.count("Scan parquet")  # sanity
    assert len(re.findall(r"lineitem\.parquet", s)) == 1


def test_q8_shape_market_share_single_fact_scan(spark, sf_dir):
    """market_share_by_year: the two-level dimension chain (part,
    supplier, orders->customer->nation->region) broadcasts; lineitem
    is scanned exactly once and the region filter never becomes a
    post-join filter over the fact."""
    s = plan(spark, sf_dir, "market_share_by_year")
    assert s.count("BroadcastHashJoin") >= 5
    assert "SortMergeJoin" not in s
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert len(re.findall(r"lineitem\.parquet", s)) == 1


def test_q14_shape_promo_share_single_pass_three_columns(spark, sf_dir):
    """promo_revenue_share: part broadcasts into a single lineitem
    pass; the CASE split computes numerator and denominator in ONE
    aggregation (no second scan), and column pruning reaches the scan
    (3 of 16 lineitem columns)."""
    s = plan(spark, sf_dir, "promo_revenue_share")
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s
    assert len(re.findall(r"lineitem\.parquet", s)) == 1
    read_schema = next(
        ln for ln in s.splitlines()
        if "ReadSchema" in ln and "l_extendedprice" in ln
    )
    assert "l_shipdate" not in read_schema and "l_comment" not in read_schema
    assert s.count("HashAggregate") >= 2  # partial + final, one pipeline


def test_q15_shape_revenue_view_computed_once(spark, sf_dir):
    """top_revenue_supplier: the revenue 'view' feeds BOTH the scalar
    max and the equality filter from the same cached relation — two
    InMemoryTableScans, never a second lineitem aggregation pipeline.
    The max arrives as a 1-row broadcast (nested-loop with a singleton
    side is the intended scalar-subquery shape)."""
    s = plan(spark, sf_dir, "top_revenue_supplier")
    assert s.count("InMemoryTableScan") == 2
    assert "BroadcastHashJoin" in s


def test_q22_shape_scalar_broadcast_and_anti_join(spark, sf_dir):
    """inactive_high_balance_customers: exactly one nested-loop join —
    the 1-row global-average broadcast (a scalar subquery, the only
    sound use of BNLJ) — plus a broadcast/hash LEFT ANTI against the
    single-column orders key projection; customer is scanned once."""
    s = plan(spark, sf_dir, "inactive_high_balance_customers")
    assert s.count("BroadcastNestedLoopJoin") == 1
    assert "LeftAnti" in s
    assert "CartesianProduct" not in s


def test_q2_shape_cost_relation_computed_once(spark, sf_dir):
    """min_cost_supplier_per_part: the region-bounded cost relation
    feeds BOTH the per-part minimum and the tie-recovering equality
    join from the same cached relation — two InMemoryTableScans, never
    a second lineitem aggregation pipeline; part/supplier/nation
    broadcast, no nested loop anywhere."""
    s = plan(spark, sf_dir, "min_cost_supplier_per_part")
    assert s.count("InMemoryTableScan") == 2
    assert "BroadcastHashJoin" in s
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s


def test_q9_shape_single_fact_scan_all_dims_broadcast(spark, sf_dir):
    """product_profit_by_nation_year: five-way join rides ONE lineitem
    scan; part/supplier/nation broadcast and the p_name LIKE filter is
    pushed into the part scan (shrinking the broadcast before it
    reaches the fact)."""
    s = plan(spark, sf_dir, "product_profit_by_nation_year")
    assert len(re.findall(r"lineitem\.parquet", s)) == 1
    assert s.count("BroadcastHashJoin") >= 3
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert "StringContains(p_name,gear)" in s


def test_q11_shape_scalar_threshold_from_cached_base(spark, sf_dir):
    """important_suppliers_by_value: the per-supplier base aggregate
    feeds BOTH the average scalar and the HAVING filter from the same
    cached relation; the scalar arrives as the one sanctioned 1-row
    nested-loop broadcast."""
    s = plan(spark, sf_dir, "important_suppliers_by_value")
    assert s.count("InMemoryTableScan") == 2
    assert s.count("BroadcastNestedLoopJoin") == 1
    assert "CartesianProduct" not in s


def test_q13_shape_priority_filter_stays_in_join_not_where(spark, sf_dir):
    """customer_order_distribution: the outer join must PRESERVE
    count-0 customers (LeftOuter in the plan) and both aggregations
    run as partial+final pairs. Pushing the priority predicate to the
    orders scan is fine — it is the join's inner side — but the join
    itself must stay outer."""
    s = plan(spark, sf_dir, "customer_order_distribution")
    assert "LeftOuter" in s
    assert s.count("HashAggregate") >= 4
    assert "CartesianProduct" not in s


def test_q20_shape_grouped_quantity_consumed_twice(spark, sf_dir):
    """excess_volume_suppliers: the (part, supplier) quantity aggregate
    is computed once and consumed twice (per-pair share and per-part
    total) — two InMemoryTableScans; the share semi-join recovers
    suppliers without any nested loop."""
    s = plan(spark, sf_dir, "excess_volume_suppliers")
    assert s.count("InMemoryTableScan") == 2
    assert "BroadcastHashJoin" in s
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s


def test_registry_reads_never_mutate_session_config(spark):
    """VERDICT r11 nit #2: queries.t() must not flip session-wide flags
    as a read side effect. The nanosAsLong posture lives in
    session.get_spark (asserted on the test session, which get_spark
    built); t()'s source carries no conf.set — grep-level pin so the
    mutation cannot quietly return."""
    import inspect

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark import queries as q

    assert "conf.set" not in inspect.getsource(q.t)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
