"""Standard analytics query surface: grouped aggregation variants,
grouping sets (rollup/cube), pivot, set ops, windows, sessionization.

The reference itself has no groupBy/window/sort usage (SURVEY.md §2.7)
— these are the warehouse-query capabilities its star schema exists to
serve, exposed as first-class oracle-checked engine queries. Window
aggregations of doubles use exact DECIMAL accumulation so segment-tree
vs sequential evaluation order differences between engines can't show
up in the low bits.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.queries import (
    davg,
    dsum,
    query,
    t,
    _DEC,
)


@query(
    "supplier_agg_having",
    oracle="""
    SELECT l_suppkey,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / CAST(COUNT(l_extendedprice) AS DOUBLE) AS avg_price,
           CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
           CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price,
           COUNT(DISTINCT l_partkey) AS n_parts
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 1500
    """,
)
def supplier_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy + multi-agg + HAVING. min/max of doubles are
    order-independent (no accumulation), so they pass through raw."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum("l_quantity").alias("sum_qty"),
            davg("l_extendedprice").alias("avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .filter(F.col("sum_qty") > 1500.0)
    )


@query(
    "rollup_pricing",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets — subtotal rows carry NULL group keys in
    both engines."""
    return (
        t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
    )


@query(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total"))
    )


@query(
    "pivot_linestatus",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'O') AS DOUBLE) AS "O",
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) FILTER (WHERE l_linestatus = 'F') AS DOUBLE) AS "F"
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-values job;
    at scale always pass the list)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double"))
    )


@query(
    "setops_segments",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def setops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (set semantics, deduplicating) — BUILDING
    customers with open orders, minus any with a >400k order."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    open_orders = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    big = (
        orders.filter(F.col("o_totalprice") > 400000.0)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(open_orders).exceptAll(big.distinct()).distinct()


@query(
    "window_running_supplier",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_qty,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY l_suppkey
             ORDER BY l_shipdate, l_orderkey, l_linenumber
           ) AS INTEGER) AS rn
    FROM lineitem
    WHERE l_suppkey <= 50
    """,
)
def window_running_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-total window with a fully deterministic ORDER BY
    (shipdate alone has ties). Exact decimal accumulation keeps the
    prefix sums identical across engines."""
    w = Window.partitionBy("l_suppkey").orderBy(
        "l_shipdate", "l_orderkey", "l_linenumber"
    )
    return (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 50)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(F.col("l_quantity").cast(_DEC))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double")
            .alias("running_qty"),
            F.row_number().over(w).alias("rn"),
        )
    )


@query(
    "lag_order_gap_days",
    oracle="""
    SELECT o_custkey, o_orderkey,
           COALESCE(CAST(date_diff('day',
             LAG(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
             o_orderdate) AS BIGINT), -1) AS gap_days
    FROM orders
    WHERE o_custkey <= 200
    """,
)
def lag_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + date arithmetic: days since the customer's previous order
    (NULL for the first)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.coalesce(
                F.datediff(
                    F.to_date("o_orderdate"), F.to_date(F.lag("o_orderdate").over(w))
                ).cast("bigint"),
                F.lit(-1).cast("bigint"),
            ).alias("gap_days"),
        )
    )


@query(
    "sessionize_events",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) > 1800000
                  OR LAG(ts) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id,
             SUM(new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (30-min inactivity gap) via lag + cumulative flag
    sum — the batch twin of streaming session_window. Integer epoch-ms
    arithmetic, so no float issues; one shuffle on user_id serves both
    windows and the final rollup."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev = t(spark, sf_dir, "events")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)) > 1_800_000)
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    sessions = flagged.select(
        "user_id",
        "event_id",
        F.sum("new_session").over(cum).cast("bigint").alias("session_id"),
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@query(
    "events_hourly_tumbling",
    oracle="""
    SELECT CAST(time_bucket(INTERVAL '1 hour', ts) AS TIMESTAMP) AS hour_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window aggregation (batch spelling of the streaming
    windowed agg; both are epoch-aligned hour buckets)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("hour_start"), "event_type", "n", "total_value"
        )
    )


@query(
    "events_sliding_30m",
    oracle="""
    WITH w AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws,
             event_type
      FROM events
    )
    SELECT CAST(ws AS TIMESTAMP) AS window_start, event_type, COUNT(*) AS n
    FROM w GROUP BY 1, 2
    """,
)
def events_sliding_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 hour, slide 30 min): every event lands in
    exactly two windows; the oracle unnests both epoch-aligned
    candidate starts. Same code runs under readStream."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )


@query(
    "grouping_sets_orders",
    oracle="""
    SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
           COALESCE(c_mktsegment, 'ALL') AS segment,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY GROUPING SETS ((o_orderpriority), (c_mktsegment), ())
    """,
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (one pass, expanded map-side like
    rollup/cube); grouped-out columns coalesced so the output is
    null-free for order-insensitive comparison."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
               COALESCE(c_mktsegment, 'ALL') AS segment,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY GROUPING SETS ((o_orderpriority), (c_mktsegment), ())
        """
    )


@query(
    "orders_monthly_summary",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(extract(year FROM o_orderdate) AS INTEGER) AS order_year,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY 1, 2
    """,
)
def orders_monthly_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal rollup — date_trunc/extract function coverage."""
    o = t(spark, sf_dir, "orders")
    return o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.year("o_orderdate").alias("order_year"),
    ).agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("total_price"))


@query(
    "part_string_features",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substr(p_name, 1, 10) AS name_prefix,
           replace(p_type, ' ', '_') AS type_slug,
           CAST(length(p_name) AS INTEGER) AS name_len
    FROM part
    WHERE p_partkey % 20 = 0
    """,
)
def part_string_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function coverage (upper/substring/replace/length) —
    scan-bound Column expressions."""
    p = t(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 10).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.length("p_name").alias("name_len"),
    )


@query(
    "nation_segments_collected",
    oracle="""
    SELECT n_name,
           array_to_string(list_sort(list_distinct(list(c_mktsegment))), ',') AS segments
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def nation_segments_collected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation (collect_set + sort, joined to a scalar so
    the pandas-based comparator can sort/hash it)."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(n, c["c_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias(
                "segments"
            )
        )
    )


@query(
    "semijoin_customers_with_open_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)
def semijoin_customers_with_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): one shuffle on the key, no row
    multiplication however many orders match."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(
        o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_semi"
    ).select("c_custkey", "c_mktsegment")


@query(
    "approx_distinct_customers",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT o_custkey) AS exact_customers,
           TRUE AS approx_ok
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-count sketch per segment. DuckDB's sketch
    differs bit-wise, so the oracle checks an invariant instead: the
    exact distinct count (computed identically by both engines) plus a
    Spark-side assertion that the HLL estimate lands within 3x the
    requested rsd of exact. At scale the sketch replaces a full
    distinct shuffle with fixed-size mergeable state."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    agg = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        )
    )
    err = F.abs(F.col("approx_customers") - F.col("exact_customers"))
    return agg.select(
        "c_mktsegment",
        "exact_customers",
        (err <= 3 * 0.02 * F.col("exact_customers")).alias("approx_ok"),
    )


@query(
    "approx_percentile_prices",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n, TRUE AS p50_ok, TRUE AS p95_ok
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile sketch (percentile_approx, KLL-style bounded memory) of
    order totals per priority — fixed-memory alternative to a global
    sort. The sketch guarantees rank error <= 1/accuracy; the oracle
    checks the invariant that each estimate lies between the exact
    percentiles at q +/- 0.01 (both engines compute the group count
    exactly; the bracketing booleans are Spark-side assertions)."""
    o = t(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50"),
        F.percentile_approx("o_totalprice", 0.95, 10000).alias("p95"),
        F.expr(
            "percentile(o_totalprice, array(0.49, 0.51, 0.94, 0.96))"
        ).alias("exact_q"),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        ((F.col("p50") >= F.col("exact_q")[0]) & (F.col("p50") <= F.col("exact_q")[1]))
        .alias("p50_ok"),
        ((F.col("p95") >= F.col("exact_q")[2]) & (F.col("p95") <= F.col("exact_q")[3]))
        .alias("p95_ok"),
    )


@query(
    "cumulative_daily_revenue",
    oracle="""
    WITH d AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS day_rev
      FROM orders GROUP BY 1
    )
    SELECT day,
           CAST(day_rev AS DOUBLE) AS day_revenue,
           CAST(SUM(day_rev) OVER (ORDER BY day
                RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS cum_revenue
    FROM d
    """,
)
def cumulative_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame running total over daily buckets — decimal
    accumulation keeps the running sum order-independent and exact."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("day_rev"))
    w = (
        Window.orderBy("day")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily.select(
        "day",
        F.col("day_rev").cast("double").alias("day_revenue"),
        F.sum("day_rev").over(w).cast("double").alias("cum_revenue"),
    )


@query(
    "supplier_cost_quartiles",
    oracle="""
    SELECT s_suppkey, s_nationkey,
           CAST(NTILE(4) OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS INTEGER) AS quartile,
           PERCENT_RANK() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal, s_suppkey) AS pr
    FROM supplier
    """,
)
def supplier_cost_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-family window functions (ntile, percent_rank) with a
    deterministic total order (acctbal, suppkey tie-break)."""
    s = t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy("s_acctbal", "s_suppkey")
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
    )


@query(
    "asof_purchase_last_click",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS us
      FROM events
    ), tagged AS (
      SELECT user_id, us, 0 AS side, event_id AS tb,
             {'rts': us, 'click_id': event_id} AS payload,
             CAST(NULL AS BIGINT) AS purchase_id
      FROM e WHERE event_type = 'click'
      UNION ALL
      SELECT user_id, us, 1, NULL, NULL, event_id
      FROM e WHERE event_type = 'purchase'
    ), win AS (
      SELECT user_id, us, side, purchase_id,
             last_value(payload IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY us, side, tb
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS m
      FROM tagged
    )
    SELECT purchase_id, user_id, us AS purchase_us,
           COALESCE(m.click_id, -1) AS click_id,
           COALESCE(us - m.rts, -1) AS gap_us
    FROM win WHERE side = 1
    """,
)
def asof_purchase_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: every purchase annotated with the user's
    most recent click at-or-before it (ties on the click side resolve
    to the greatest click id). The engine plan is join-free — one
    union + one window over user_id (operators/joins.py::asof_join);
    the oracle is the same union-window algorithm spelled in SQL,
    which is also what DuckDB's native ASOF JOIN computes."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import joins as J

    ev = t(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("us").alias("purchase_us"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("us").alias("click_us"), F.col("event_id").alias("click_id")
    )
    out = J.asof_join(
        purchases,
        clicks,
        on=["user_id"],
        left_ts="purchase_us",
        right_ts="click_us",
        right_value_cols=["click_id"],
        tiebreak="click_id",
    )
    return out.select(
        "purchase_id",
        "user_id",
        "purchase_us",
        F.coalesce("click_id", F.lit(-1)).alias("click_id"),
        F.coalesce(F.col("purchase_us") - F.col("matched_ts"), F.lit(-1)).alias(
            "gap_us"
        ),
    )


@query(
    "range_join_error_context",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, event_type,
             CAST(epoch_us(ts) AS BIGINT) AS us
      FROM events
    )
    SELECT a.event_id AS error_id, b.event_id AS ctx_id,
           a.us - b.us AS gap_us
    FROM e a JOIN e b
      ON a.user_id = b.user_id
     AND b.us BETWEEN a.us - 3600000000 AND a.us
    WHERE a.event_type = 'error' AND b.event_type <> 'error'
    """,
)
def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: each error event paired with every same-user
    non-error event in the preceding hour. The engine plan is the
    binned equi-join (operators/joins.py::range_join) — hash shuffle
    on (user_id, time bin), never a nested-loop join; the oracle is
    the naive inequality join DuckDB can afford at oracle scale."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import joins as J

    ev = t(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"), "user_id", F.col("us").alias("err_us")
    )
    others = ev.filter(F.col("event_type") != "error").select(
        "user_id", F.col("event_id").alias("ctx_id"), F.col("us").alias("ctx_us")
    )
    pairs = J.range_join(
        errors,
        others,
        on=["user_id"],
        left_ts="err_us",
        right_ts="ctx_us",
        lower=-3_600_000_000,
        upper=0,
    )
    return pairs.select(
        "error_id", "ctx_id", (F.col("err_us") - F.col("ctx_us")).alias("gap_us")
    )


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH s1 AS (
      SELECT DISTINCT user_id, ts AS t FROM events WHERE event_type = 'view'
    ), s2 AS (
      SELECT DISTINCT e.user_id, e.ts AS t FROM events e
      WHERE e.event_type = 'click' AND EXISTS (
        SELECT 1 FROM s1 WHERE s1.user_id = e.user_id
          AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL '1 day')
    ), s3 AS (
      SELECT DISTINCT e.user_id, e.ts AS t FROM events e
      WHERE e.event_type = 'purchase' AND EXISTS (
        SELECT 1 FROM s2 WHERE s2.user_id = e.user_id
          AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL '1 day')
    )
    SELECT 1 AS step_idx, 'view' AS step, CAST((SELECT COUNT(DISTINCT user_id) FROM s1) AS BIGINT) AS n_users
    UNION ALL
    SELECT 2, 'click', CAST((SELECT COUNT(DISTINCT user_id) FROM s2) AS BIGINT)
    UNION ALL
    SELECT 3, 'purchase', CAST((SELECT COUNT(DISTINCT user_id) FROM s3) AS BIGINT)
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel with a 1-day max gap between consecutive steps,
    exists-a-valid-sequence semantics: a user reaches step i if SOME
    chain of view → click → purchase stays within the gap at every hop
    (operators/events.py — per step one user-keyed semi-join over the
    qualifying step times, never a stream self-join). The oracle
    reproduces the same recurrence with EXISTS subqueries."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.events import (
        funnel_counts,
    )

    return funnel_counts(
        t(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        max_gap="'1' DAY",
    )


@query(
    "retention_weekly_purchases",
    oracle="""
    WITH act AS (
      SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS w
      FROM events WHERE event_type = 'purchase'
    ), fw AS (
      SELECT u, MIN(w) AS w0 FROM act GROUP BY u
    )
    SELECT CAST(date_diff('day', fw.w0, act.w) // 7 AS INTEGER) AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM act JOIN fw USING (u)
    GROUP BY week_offset
    """,
)
def retention_weekly_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly purchase-retention cohorts (operators/events.py):
    date_trunc week buckets + integer day difference — identical
    arithmetic in both engines, no week-diff dialect."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.events import (
        retention_counts,
    )

    return retention_counts(t(spark, sf_dir, "events"), step_type="purchase")


_ZBITS = 8
# DuckDB spelling of the floor-quantize + Morton interleave the Spark
# side builds below — generated once so both engines run the SAME
# arithmetic (floor, clamp, shift) term for term.
_DUCK_ZQ = (
    "LEAST(GREATEST(CAST(floor((CAST({c} AS DOUBLE) - {{lo}}) / ({{hi}} - {{lo}}) "
    f"* {(1 << _ZBITS) - 1}) AS BIGINT), 0), {(1 << _ZBITS) - 1})"
)
_DUCK_Z = " | ".join(
    f"(((q{c} >> {b}) & 1) << {b * 2 + c})" for b in range(_ZBITS) for c in (0, 1)
)


@query(
    "heavy_hitters_event_types",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / (SELECT COUNT(*) FROM events) AS share
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type LIMIT 5
    """,
)
def heavy_hitters_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy hitters over a prospective shuffle key
    (operators/diagnostics.py): one map-side-combined groupBy count and
    a per-partition-heap top-k — the hot key's rows never congregate
    anywhere just to be measured."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.diagnostics import (
        heavy_hitters,
    )

    return heavy_hitters(t(spark, sf_dir, "events"), "event_type", k=5)


@query(
    "zorder_keys_orders",
    oracle=f"""
    WITH b AS (
      SELECT MIN(o_custkey) AS lo0, MAX(o_custkey) AS hi0,
             MIN(o_totalprice) AS lo1, MAX(o_totalprice) AS hi1
      FROM orders
    ), q AS (
      SELECT o_orderkey,
             {_DUCK_ZQ.format(c="o_custkey").replace("{{lo}}", "{lo}").replace("{{hi}}", "{hi}").format(lo="b.lo0", hi="b.hi0")} AS q0,
             {_DUCK_ZQ.format(c="o_totalprice").replace("{{lo}}", "{lo}").replace("{{hi}}", "{hi}").format(lo="b.lo1", hi="b.hi1")} AS q1
      FROM orders, b
    )
    SELECT o_orderkey, CAST({_DUCK_Z.replace("q0", "q.q0").replace("q1", "q.q1")} AS BIGINT) AS z
    FROM q ORDER BY z, o_orderkey LIMIT 1000
    """,
)
def zorder_keys_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine check of the Z-order bit interleave
    (layout.zorder_value): floor-quantize (o_custkey, o_totalprice)
    into 8-bit cells and Morton-interleave the bits — DuckDB runs the
    identical floor/clamp/shift arithmetic, so the INTERLEAVE is
    pinned bit-for-bit. The production quantizer (layout._quantize)
    uses round + NULL-coalesce rather than this floor spelling; its
    clamp/monotonicity/NULL behavior is pinned by unit tests in
    tests/test_layout.py, not by this oracle. First 1000 curve
    positions (deterministic tie-break on the key)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.layout import (
        zorder_value,
    )

    orders = t(spark, sf_dir, "orders")
    lo0, hi0, lo1, hi1 = orders.agg(
        F.min("o_custkey").cast("double"), F.max("o_custkey").cast("double"),
        F.min("o_totalprice").cast("double"), F.max("o_totalprice").cast("double"),
    ).first()
    n = (1 << _ZBITS) - 1

    def quant(c: str, lo: float, hi: float) -> Column:
        scaled = (F.col(c).cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)
        return F.least(
            F.greatest(F.floor(scaled).cast("long"), F.lit(0)), F.lit(n)
        )

    z = zorder_value(
        [quant("o_custkey", lo0, hi0), quant("o_totalprice", lo1, hi1)], _ZBITS
    )
    return (
        orders.select("o_orderkey", z.alias("z"))
        .orderBy("z", "o_orderkey")
        .limit(1000)
    )


@query(
    "shipping_priority_top10",
    oracle="""
    SELECT l.l_orderkey,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS DOUBLE) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape — unshipped-order revenue ranking: two pruned
    scans feed a broadcast of the filtered customer side, the
    lineitem-side revenue aggregates partially map-side, and the top-10
    plans as per-partition heaps (TakeOrderedAndProject), never a
    global sort. Exact-decimal revenue keeps the ranking bit-identical
    to the oracle."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@query(
    "returned_revenue_by_customer",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS DOUBLE) AS lost_revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_revenue_by_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape — revenue lost to returns per customer: the
    returnflag filter prunes lineitem at the scan, nation broadcasts,
    and the single wide stage is the (custkey) aggregation; top-20 via
    partition heaps."""
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "lost_revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("lost_revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "cobucketed_join_revenue",
    oracle="""
    SELECT c_mktsegment AS mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def cobucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join through the bucketed layout (the DISTKEY analog,
    sources/bucketed.py): both sides are written ``bucketBy(8,
    custkey)`` + ``sortBy`` via the session catalog, then joined WITHOUT
    an exchange on either side — the write pays the shuffle once,
    every later join on the key reads it back for free (zero-Exchange
    plan pinned in tests/test_bucketed.py). The oracle is the PLAIN
    join: bucketing is a physical layout, so the result must be
    byte-identical to the logical join it accelerates."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.bucketed import (
        cobucketed_join,
        write_bucketed_table,
    )

    orders = t(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "custkey")
    cust = t(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "custkey")
    write_bucketed_table(orders, "cobkt_orders", ["custkey"], 8, sort_cols=["custkey"])
    write_bucketed_table(cust, "cobkt_customer", ["custkey"], 8, sort_cols=["custkey"])
    j = cobucketed_join(spark, "cobkt_orders", "cobkt_customer", ["custkey"])
    return j.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


@query(
    "txlog_orders_time_travel",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(COUNT(*) FILTER (WHERE o_orderkey % 3 <> 0) AS BIGINT) AS n_v0,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def txlog_orders_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Governed-transaction surface end to end (sources/txlog.py — the
    start/commit/cancel_transaction analog, reference context.py:676-683):
    orders lands in a commit-log table in two transactions (version 0 =
    orderkey % 3 != 0, version 1 appends the rest) with an ABORTED
    transaction in between that must leave no trace. The result joins the
    HEAD snapshot's per-priority totals with a TIME-TRAVEL read of
    version 0, so a single oracle row checks atomic visibility, abort
    isolation, and snapshot reads at once — the oracle is plain SQL over
    orders because a transaction log is physical bookkeeping, not query
    semantics."""
    import hashlib
    import shutil
    import tempfile

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
        TxTable,
        cancel_transaction,
        start_transaction,
    )

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "graft_txlog_" + hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(root, ignore_errors=True)
    table = TxTable(spark, root)
    table.append(orders.filter(F.col("o_orderkey") % 3 != 0))
    aborted = start_transaction(table)
    aborted.append(orders.limit(100))  # must never become visible
    cancel_transaction(aborted)
    table.append(orders.filter(F.col("o_orderkey") % 3 == 0))

    head = (
        table.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            dsum("o_totalprice").alias("total_price"),
        )
    )
    v0 = (
        table.read(version=0)
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_v0"))
    )
    return (
        head.join(v0, "o_orderpriority")
        .select("o_orderpriority", "n_total", "n_v0", "total_price")
        .orderBy("o_orderpriority")
    )


@query(
    "local_supplier_volume_by_nation",
    oracle="""
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o    ON o.o_custkey = c.c_custkey
    JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
                    AND c.c_nationkey = s.s_nationkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def local_supplier_volume_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — revenue from orders where customer and supplier
    share a nation. The hard part of Q5 at scale is join order: the
    c_nationkey = s_nationkey condition only becomes an equi-key after
    both sides are reduced, so the plan goes fact-first (lineitem ⋈
    orders on orderkey — the one unavoidable big shuffle), broadcasts
    supplier and nation into it, then joins customer on custkey with
    the nation-equality folded into the join condition rather than a
    post-filter — Catalyst pushes it into the hash join, so mismatched
    rows never materialize."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(
            c,
            (o.o_custkey == c.c_custkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "returnflag_priority_counts",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def returnflag_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — conditional aggregation after a fact-fact
    join (this testdata has no receiptdate or shipmode, so the Q12
    window runs on shipdate and groups by returnflag): the range lands in PushedFilters at the lineitem
    scan, orders is projected to the two columns the CASE needs, and
    the priority split is computed map-side inside the partial
    aggregation — no second shuffle. The literal is cast to the
    column's own timestamp flavor so the predicate stays pushable
    whether the parquet reads as TIMESTAMP or TIMESTAMP_NTZ."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem")
    ship_t = dict(li.dtypes)["l_shipdate"]
    lo = F.lit("1996-01-01 00:00:00").cast(ship_t)
    hi = F.lit("1998-01-01 00:00:00").cast(ship_t)
    l = (
        li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "hll_sketch_union_users",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact,
           TRUE AS est_ok
    FROM events GROUP BY event_type
    UNION ALL
    SELECT 'ALL', CAST(COUNT(DISTINCT user_id) AS BIGINT), TRUE FROM events
    ORDER BY event_type
    """,
)
def hll_sketch_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL,
    native in Spark): one sketch per event_type, then the per-type
    sketches are UNIONED into a corpus-wide estimate without touching
    the raw rows again — the pattern that matters at 100 TB, where
    per-partition sketches are built once and every rollup after that
    merges kilobyte sketch blobs instead of re-scanning. The exact
    per-type distinct (one shuffle, oracle-matched) rides along;
    ``est_ok`` pins each estimate within 5%+1 of exact (default lgK=12
    is ~1.6% rsd, so the bound is ~3 sigma)."""
    ev = t(spark, sf_dir, "events").select("event_type", "user_id")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.hll_sketch_agg("user_id").alias("sk"),
    )
    ok = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
        <= 0.05 * F.col("n_exact") + 1
    )
    per_rows = per.select("event_type", "n_exact", ok.alias("est_ok"))
    merged = per.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_all")
    )
    all_row = (
        ev.agg(F.countDistinct("user_id").alias("n_exact"))
        .crossJoin(F.broadcast(merged))
        .select(
            F.lit("ALL").alias("event_type"),
            "n_exact",
            (
                F.abs(F.col("est_all") - F.col("n_exact"))
                <= 0.05 * F.col("n_exact") + 1
            ).alias("est_ok"),
        )
    )
    return per_rows.unionByName(all_row).orderBy("event_type")


_Q6_TEXT = """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem
WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


@query("sql_text_passthrough", oracle=_Q6_TEXT)
def sql_text_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the ONE SQL string is both the Spark query
    (``spark.sql`` over a registered view) and the DuckDB oracle —
    character-identical text, so this entry proves the engine's ANSI
    SQL surface, not just the DataFrame API, agrees with the oracle.
    TPC-H Q6 shape: both range predicates reach the parquet scan as
    pushed filters and the aggregate runs map-side partial."""
    t(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q6_TEXT)


@query(
    "expectations_orders_quality",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_total,
           CAST(SUM(CASE WHEN NOT (o_totalprice <= 300000 AND o_orderstatus IN ('O','F'))
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
           CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_failed_price_cap,
           CAST(SUM(CASE WHEN o_orderstatus NOT IN ('O','F') THEN 1 ELSE 0 END) AS BIGINT)
             AS n_failed_final_status,
           CAST(SUM(CASE WHEN o_totalprice <= 300000 AND o_orderstatus IN ('O','F')
                         THEN CAST(o_totalprice AS DECIMAL(38,6)) END) AS DOUBLE)
             AS valid_total_price
    FROM orders
    """,
)
def expectations_orders_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gate (operators/expectations.py): two named rules
    over orders, quarantine mode — the result row carries the total,
    the quarantine size, per-rule violation counts recomputed from the
    quarantined frame's ``failed_expectations`` attribution array, and
    the exact-decimal price total of the rows that passed. The oracle
    re-derives every number with plain CASE sums, so the split logic,
    the per-rule attribution, and the survivor set are all pinned in
    one row. Single narrow pass per branch; no shuffle until the final
    1-row aggregates."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.expectations import (
        check_expectations,
    )

    orders = t(spark, sf_dir, "orders")
    valid, quarantined, _obs = check_expectations(
        orders,
        {
            "price_cap": F.col("o_totalprice") <= 300000,
            "final_status": F.col("o_orderstatus").isin("O", "F"),
        },
    )
    v = valid.agg(
        F.count(F.lit(1)).alias("n_valid"),
        dsum("o_totalprice").alias("valid_total_price"),
    )
    q = quarantined.agg(
        F.count(F.lit(1)).alias("n_quarantined"),
        F.sum(
            F.when(F.array_contains("failed_expectations", "price_cap"), 1).otherwise(0)
        ).alias("n_failed_price_cap"),
        F.sum(
            F.when(
                F.array_contains("failed_expectations", "final_status"), 1
            ).otherwise(0)
        ).alias("n_failed_final_status"),
    )
    return v.crossJoin(F.broadcast(q)).select(
        (F.col("n_valid") + F.col("n_quarantined")).alias("rows_total"),
        "n_quarantined",
        "n_failed_price_cap",
        "n_failed_final_status",
        "valid_total_price",
    )


@query(
    "promo_revenue_share",
    oracle="""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
               / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS DOUBLE)
               AS DOUBLE) AS promo_pct,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    """,
)
def promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape — promotional revenue share: part broadcasts
    into the lineitem scan (fact never shuffles), the conditional and
    total revenue accumulate as exact decimals in ONE partial-agg pass,
    and the percentage divides the two doubles at the end — identical
    arithmetic order in both engines."""
    l = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", rev).otherwise(
                        F.lit(0).cast(_DEC)
                    )
                ).cast("double")
                / F.sum(rev).cast("double")
            ).cast("double").alias("promo_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "order_priority_exists",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape — EXISTS decorrelated to a left-semi join: the
    date range prunes the orders scan, the returnflag filter prunes the
    lineitem probe side BEFORE the semi-join (the semi-join never
    materializes lineitem columns, so the shuffle carries only
    l_orderkey), and the priority count aggregates map-side. The
    reference's schedule-correlated subquery shape, Spark-first.
    (The canonical Q4 predicate l_commitdate < l_receiptdate needs
    columns this testdata lacks; 'R' returns stand in — same plan.)"""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    l = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@query(
    "volume_shipping_nations",
    oracle="""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS ship_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS volume
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
    JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
    WHERE (ns.n_name = 'NATION_3' AND nc.n_name = 'NATION_7')
       OR (ns.n_name = 'NATION_7' AND nc.n_name = 'NATION_3')
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def volume_shipping_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume by year. The two nation
    dims broadcast and their name filter is applied BEFORE the join, so
    only customers/suppliers of the two nations survive into the fact
    joins — at 100 TB the nation pair predicate prunes ~92% of both dim
    sides before any shuffle. The disjunctive pair filter lands after
    both broadcasts (it needs columns from both), still pre-aggregation."""
    sel = F.lit("NATION_3"), F.lit("NATION_7")
    nc = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    ns = (
        t(spark, sf_dir, "nation")
        .filter(F.col("n_name").isin("NATION_3", "NATION_7"))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(nc), F.col("c_nationkey") == F.col("c_nk")
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(ns), F.col("s_nationkey") == F.col("s_nk")
    )
    l = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .filter(
            ((F.col("supp_nation") == sel[0]) & (F.col("cust_nation") == sel[1]))
            | ((F.col("supp_nation") == sel[1]) & (F.col("cust_nation") == sel[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("ship_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"))
        .orderBy("supp_nation", "cust_nation", "ship_year")
    )


@query(
    "parts_supplier_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 9, 19, 23, 36, 45, 49, 3)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 50
    """,
)
def parts_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — supplier diversity per part spec. The NOT IN
    subquery decorrelates to a broadcast left-anti join (the excluded
    supplier set is tiny and NOT-IN-null-safe here: s_suppkey is a key,
    never NULL); part filters push to the part scan, which then
    broadcasts into lineitem. COUNT(DISTINCT) shuffles once on the
    group keys with distinct-aggregate expansion — no second shuffle."""
    excl = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 9, 19, 23, 36, 45, 49, 3)
    )
    l = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        l.join(F.broadcast(excl), l.l_suppkey == excl.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(50)
    )


@query(
    "large_order_customers",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(38,6))) > 175)
    GROUP BY 1, 2, 3, 4, 5
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape — large-quantity orders. The IN subquery is the
    same aggregation the outer query needs, so compute it ONCE: aggregate
    lineitem per order, filter the threshold, and semi-join orders on the
    surviving keys (a ~0.1% selective set). The big lineitem re-join for
    total_qty reuses the already-aggregated frame — the fact table is
    scanned and shuffled exactly once."""
    l = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    per_order = l.groupBy("l_orderkey").agg(dsum("l_quantity").alias("total_qty"))
    big = per_order.filter(F.col("total_qty") > 175.0)
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


@query(
    "disjunctive_part_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)))
                AS DOUBLE) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — OR-of-AND predicates across both join sides.
    The single-table disjuncts are FACTORED OUT so each side's scan
    prunes before the join: part keeps only the three brands (and the
    union of size ranges), lineitem keeps only the union of quantity
    ranges — Catalyst can't infer these from the cross-side OR on its
    own, so stating them explicitly is what makes the 100 TB scan
    skip >90% of row groups. The residual OR applies post-join."""
    p = t(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
        & F.col("p_size").between(1, 15)
    )
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "inactive_high_balance_customers",
    oracle="""
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_custs,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_bal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                                / CAST(COUNT(c_acctbal) AS DOUBLE)
                         FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 300000.0)
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
)
def inactive_high_balance_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — rich customers with no large orders (this
    testdata gives every customer at least one order, so the canonical
    'never ordered' cohort is empty; the big-order variant keeps the
    plan shape AND a non-vacuous result set). The scalar
    subquery (global average positive balance) is a 1-row aggregate
    broadcast into the filter; NOT EXISTS decorrelates to a left-anti
    join against the orders key projection. The anti-join shuffles only
    (custkey) pairs — at 100 TB the orders side is a single-column
    exchange, and the balance filter runs before it to shrink the
    customer side first. Exact-decimal avg keeps the threshold
    bit-identical across engines."""
    c = t(spark, sf_dir, "customer")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal").alias("avg_bal"))
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000.0)
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dsum("c_acctbal").alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "txlog_dml_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' AND o_totalprice >= 250000.0
                              THEN o_totalprice * 0.9 ELSE o_totalprice END
                     AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 1000.0)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def txlog_dml_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DML through the commit log: orders lands in FOUR append
    transactions keyed by totalprice band (so the manifest carries
    disjoint per-file min/max stats), then DELETE removes cheap
    finished orders and UPDATE applies a 10% markdown to expensive
    finished ones — each committing O(files-touched): the stats
    range hints prune the untouched price bands at the MANIFEST, and
    their files survive by reference (same paths, zero bytes
    rewritten — the property tests/test_txlog.py pins). The oracle is
    the same DELETE+UPDATE expressed as WHERE + CASE over plain
    orders — transactional bookkeeping must be invisible to query
    semantics."""
    import hashlib
    import shutil
    import tempfile

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
        TxTable,
    )

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "graft_txdml_" + hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(root, ignore_errors=True)
    table = TxTable(spark, root, stats_columns=["o_totalprice"])
    bands = [(0.0, 1000.0), (1000.0, 150000.0), (150000.0, 250000.0), (250000.0, 1e18)]

    # The four banded loads are data-independent (disjoint predicates,
    # append-only), so submit them concurrently and let the scheduler
    # back-fill each job's tail (guide §2.6 overlap pattern): each
    # append is a 4-task write that would otherwise hold the whole
    # cluster hostage serially. Txlog append commits rebase-and-retry
    # on a lost version race by design (txlog.py::commit — the same
    # machinery the cross-JVM compactor/appender race tests pin), and
    # the table CONTENT is commit-order-independent for disjoint
    # appends, so the read-side result is identical. Measured at sf0.1
    # local[32]: ~3.3s -> ~1.7s for the full DML chain.
    def _load_band(band: tuple[float, float]) -> None:
        lo, hi = band
        table.append(
            orders.filter(
                (F.col("o_totalprice") >= lo) & (F.col("o_totalprice") < hi)
            ).coalesce(4)
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(bands)) as pool:
        list(pool.map(_load_band, bands))
    table.delete(
        "o_orderstatus = 'F' AND o_totalprice < 1000.0",
        range_filter={"o_totalprice": (0.0, 1000.0)},
    )
    table.update(
        "o_orderstatus = 'F' AND o_totalprice >= 250000.0",
        {"o_totalprice": "o_totalprice * 0.9"},
        range_filter={"o_totalprice": (250000.0, 1e18)},
    )
    return (
        table.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "top_revenue_supplier",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS r
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, CAST(rev.r AS DOUBLE) AS total_rev
    FROM supplier s JOIN rev ON s.s_suppkey = rev.l_suppkey
    WHERE rev.r = (SELECT MAX(r) FROM rev)
    ORDER BY s.s_suppkey
    """,
)
def top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape — supplier(s) hitting the quarter's maximum
    revenue. The revenue 'view' is computed ONCE and reused for both
    the scalar max and the equality filter (persist() pins it so the
    two consumers don't recompute the fact scan); the max is a 1-row
    broadcast. The equality compares exact DECIMALS — comparing
    rounded doubles would nondeterministically drop ties, which is
    exactly the bug Q15 exists to probe."""
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = (
        l.groupBy("l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
            .alias("r")
        )
        .persist()
    )
    mx = rev.agg(F.max("r").alias("mx"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx))
        .filter(F.col("r") == F.col("mx"))
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("r").cast("double").alias("total_rev"))
        .orderBy("s_suppkey")
    )


@query(
    "small_quantity_revenue",
    oracle="""
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(38,6)))
                                             AS DOUBLE) / CAST(COUNT(l2.l_quantity) AS DOUBLE))
                          FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue from below-average-quantity line items
    of one brand. The correlated per-part average decorrelates to a
    grouped aggregate JOINED back; crucially the brand's part keys
    broadcast into BOTH lineitem consumers, so the per-part average is
    computed only over the brand's ~0.1% of parts — the naive
    decorrelation aggregates all 100 TB of lineitem to use 0.1% of the
    result. The threshold is exact-decimal avg × 0.2 in both engines."""
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    l = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_items = l.join(F.broadcast(p), l.l_partkey == p.p_partkey).persist()
    per_part = brand_items.groupBy("l_partkey").agg(
        (F.lit(0.2) * davg("l_quantity")).alias("thresh")
    )
    return (
        brand_items.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("thresh"))
        .agg(
            (dsum("l_extendedprice") / F.lit(7.0)).cast("double").alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "sole_problem_supplier",
    oracle="""
    WITH per AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_bad,
             MAX(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS bad_supp
      FROM lineitem GROUP BY l_orderkey)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM per JOIN supplier s ON s.s_suppkey = per.bad_supp
    WHERE per.n_supp >= 2 AND per.n_bad = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def sole_problem_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — suppliers who were the ONLY problem supplier
    on multi-supplier orders. The canonical form is an EXISTS plus a
    NOT-EXISTS correlated on the same table; both collapse into ONE
    grouped pass over lineitem (distinct-supplier count, problem-
    supplier count, the problem supplier itself), so the 100 TB fact
    is scanned once and shuffled once on l_orderkey — instead of the
    three scans and two correlated semi-join shuffles of the literal
    translation. Supplier broadcasts into the survivors."""
    l = t(spark, sf_dir, "lineitem")
    bad = F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
    per = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(bad).alias("n_bad"),
        F.max(bad).alias("bad_supp"),
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per.filter((F.col("n_supp") >= 2) & (F.col("n_bad") == 1))
        .join(F.broadcast(s), F.col("bad_supp") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@query(
    "txlog_point_lookup_orders",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS o_totalprice
    FROM orders
    WHERE o_orderkey IN (7, 7777, 11111)
    ORDER BY o_orderkey
    """,
)
def txlog_point_lookup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-pruned point lookups through the commit log: orders lands
    in several transactions (disjoint orderkey bands, one file each,
    per-file Bloom filters on o_orderkey in the manifest), then each
    point probe opens only the files whose bloom admits the key —
    min/max stats can't prune equality on high-cardinality keys once
    files interleave, which is exactly the lookup shape (sample
    inspection, incident forensics) a 100 TB table serves worst
    without it. All three probes ride ONE multi-key read (one probe
    job + one scan over the bloom-union of admitted files, instead of
    three reads unioned — N× fewer fixed job costs at a real lookup
    rate), row-filtered on top of the file skip as the contract
    requires."""
    import hashlib
    import shutil
    import tempfile

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
        TxTable,
    )

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "graft_txbloom_" + hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(root, ignore_errors=True)
    table = TxTable(spark, root, bloom_columns=["o_orderkey"])
    for band in range(4):
        table.append(
            orders.filter(F.col("o_orderkey") % 4 == band).coalesce(1)
        )
    probes = [7, 7777, 11111]
    return (
        table.read(equality_filter={"o_orderkey": probes})
        .filter(F.col("o_orderkey").isin(probes))
        .orderBy("o_orderkey")
    )


@query(
    "txlog_schema_evolution_orders",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def txlog_schema_evolution_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through the commit log: orders lands in two
    transactions, o_totalprice is RENAMED to price (metadata-only — no
    data rewritten), a third batch arrives under the NEW name, the
    unused o_orderstatus column is DROPPED, and the final aggregate
    reads pre-rename, post-rename, and post-drop files through one
    logical schema. The oracle is plain SQL over orders with the
    ORIGINAL names — physical bytes never moved, so the numbers must
    be identical; only the logical label changed (aliased back for
    the comparison)."""
    import hashlib
    import shutil
    import tempfile

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
        TxTable,
    )

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    root = os.path.join(
        tempfile.gettempdir(),
        "graft_txevo_" + hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(root, ignore_errors=True)
    table = TxTable(spark, root)
    table.append(orders.filter(F.col("o_orderkey") % 3 == 0))
    table.append(orders.filter(F.col("o_orderkey") % 3 == 1))
    table.rename_column("o_totalprice", "price")
    table.append(
        orders.filter(F.col("o_orderkey") % 3 == 2).withColumnRenamed(
            "o_totalprice", "price"
        )
    )
    table.drop_column("o_orderstatus")
    return (
        table.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("price").alias("total_price"),
        )
        .select(
            "o_orderpriority",
            "n_orders",
            F.col("total_price").alias("total_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "market_share_by_year",
    oracle="""
    WITH all_orders AS (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS volume,
             ns.n_regionkey AS supp_region
      FROM lineitem l
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation nc  ON c.c_nationkey = nc.n_nationkey
      JOIN region rc  ON nc.n_regionkey = rc.r_regionkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation ns  ON s.s_nationkey = ns.n_nationkey
      JOIN part p     ON l.l_partkey = p.p_partkey
      WHERE rc.r_name = 'ASIA' AND p.p_type = 'PROMO'
    )
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_region = 3 THEN volume
                              ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS eu_share,
           CAST(SUM(volume) AS DOUBLE) AS total_volume
    FROM all_orders
    GROUP BY o_year ORDER BY o_year
    """,
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape — a supplier region's share of one part type's
    sales into one customer region, by year: the deepest join tree in
    the suite (lineitem × orders × customer × nation × region ×
    supplier × nation × part). Every true dimension (part, nations,
    region-filtered nation set, supplier) broadcasts with its
    selective filter applied BEFORE the broadcast, so at 100 TB the
    only shuffled join is lineitem × orders — one exchange on the
    order key, everything else rides along — and the conditional
    share accumulates as exact decimals in ONE pass (no self-join on
    the numerator)."""
    rc = (
        t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    nc = t(spark, sf_dir, "nation").join(
        F.broadcast(rc), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nk"))
    ns = t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_regionkey").alias("supp_region")
    )
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    eu = F.when(F.col("supp_region") == 3, vol).otherwise(F.lit(0).cast(_DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(nc), c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(ns), s.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (F.sum(eu).cast("double") / F.sum(vol).cast("double")).alias("eu_share"),
            F.sum(vol).cast("double").alias("total_volume"),
        )
        .orderBy("o_year")
    )


@query(
    "min_cost_supplier_per_part",
    oracle="""
    WITH costs AS (
      SELECT l.l_partkey, l.l_suppkey, MIN(l.l_extendedprice) AS cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_regionkey = 3
      GROUP BY l.l_partkey, l.l_suppkey
    ), minc AS (
      SELECT l_partkey, MIN(cost) AS min_cost FROM costs GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, c.cost AS min_price
    FROM costs c
    JOIN minc m ON m.l_partkey = c.l_partkey AND c.cost = m.min_cost
    JOIN part p ON p.p_partkey = c.l_partkey
    JOIN supplier s ON s.s_suppkey = c.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_type = 'PROMO' AND p.p_size < 10
    ORDER BY p.p_partkey, s.s_name
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — the region's minimum-cost supplier per part:
    the correlated scalar MIN subquery decorrelates into a per-part
    aggregate of the SAME region-bounded cost relation it correlates
    over (computed once, persisted — both the min and the equality
    join back consume it), then an equality join recovers every
    supplier hitting the minimum, tie semantics included. MIN is an
    exact comparison of stored doubles — no accumulation — so
    cross-engine equality is bit-exact. Part/supplier/nation broadcast;
    the only fact-sized shuffle is the (part, supp) aggregate."""
    l = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice"
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    region_supp = (
        s.join(F.broadcast(n.filter(F.col("n_regionkey") == 3)),
               s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        l.join(F.broadcast(region_supp.select("s_suppkey")),
               l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("l_extendedprice").alias("cost"))
        .persist()
    )
    minc = costs.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    p = (
        t(spark, sf_dir, "part")
        .filter((F.col("p_type") == "PROMO") & (F.col("p_size") < 10))
        .select("p_partkey")
    )
    return (
        costs.join(minc, ["l_partkey"])
        .filter(F.col("cost") == F.col("min_cost"))
        .join(F.broadcast(p), costs.l_partkey == p.p_partkey)
        .join(F.broadcast(region_supp), costs.l_suppkey == region_supp.s_suppkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("cost").alias("min_price"),
        )
        .orderBy("p_partkey", "s_name")
    )


@query(
    "product_profit_by_nation_year",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))
                    - CAST(p.p_retailprice * l.l_quantity AS DECIMAL(38,6)))
                AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY n.n_name, YEAR(o.o_orderdate)
    ORDER BY nation, o_year
    """,
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and
    order year (revenue minus a retail-price cost proxy; the testdata
    has no partsupp table). Five-way join with every dimension
    broadcast around ONE lineitem scan; the per-row profit is computed
    as a DIFFERENCE OF DECIMALS (each double product cast before the
    subtraction) so the aggregate is order-independent and cross-engine
    exact. The p_name LIKE filter reaches the part scan and shrinks the
    broadcast before it reaches the fact."""
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey", "p_retailprice")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    l = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    profit = (
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
        - (F.col("p_retailprice") * F.col("l_quantity")).cast(_DEC)
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("nation", "o_year")
    )


@query(
    "important_suppliers_by_value",
    oracle="""
    WITH base AS (
      SELECT l.l_suppkey,
             SUM(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6))) AS val
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_regionkey = 1
      GROUP BY l.l_suppkey
    )
    SELECT l_suppkey AS s_suppkey, CAST(val AS DOUBLE) AS total_value
    FROM base
    WHERE CAST(val AS DOUBLE)
          >= (SELECT CAST(SUM(val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                     FROM base)
    ORDER BY s_suppkey
    """,
)
def important_suppliers_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — suppliers carrying an outsized share of one
    region's shipped value: per-supplier exact-decimal totals HAVING
    at or above the AVERAGE supplier's share of the GLOBAL
    scalar total over the same relation (a corpus-relative threshold —
    non-empty at every scale factor, including the sf where the region
    holds a single supplier). The base
    aggregate is computed once and persisted (both the scalar and the
    filter consume it); the scalar arrives as a 1-row broadcast. The
    share comparison happens in double on both engines, in the same
    order, so the threshold is deterministic."""
    l = t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 1)
    region_supp = s.join(
        F.broadcast(n), s.s_nationkey == n.n_nationkey
    ).select("s_suppkey")
    base = (
        l.join(F.broadcast(region_supp), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
            ).alias("val")
        )
        .persist()
    )
    total = base.agg(
        (F.sum("val").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_val"
        )
    )
    return (
        base.join(F.broadcast(total))
        .filter(F.col("val").cast("double") >= F.col("avg_val"))
        .select(
            F.col("l_suppkey").alias("s_suppkey"),
            F.col("val").cast("double").alias("total_value"),
        )
        .orderBy("s_suppkey")
    )


@query(
    "customer_order_distribution",
    oracle="""
    WITH counts AS (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o
        ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    )
    SELECT CAST(c_count AS BIGINT) AS c_count,
           CAST(COUNT(*) AS BIGINT) AS custdist
    FROM counts
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the distribution of per-customer order counts,
    with the priority filter INSIDE the outer-join condition (the
    query's defining subtlety: a customer whose only orders are urgent
    must surface with count 0, which a WHERE clause would delete).
    Pure integer counting — cross-engine exact by construction. Two
    shuffles: the custkey aggregate, then the tiny count-of-counts."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    counts = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey)
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "excess_volume_suppliers",
    oracle="""
    WITH scope AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(38,6))) AS qty
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'SMALL'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_partkey, l.l_suppkey
    ), tot AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM scope GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name
    FROM scope sc
    JOIN tot ON tot.l_partkey = sc.l_partkey
    JOIN supplier s ON s.s_suppkey = sc.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE CAST(sc.qty AS DOUBLE) > 0.3 * CAST(tot.total_qty AS DOUBLE)
      AND n.n_regionkey = 2
    ORDER BY s.s_suppkey
    """,
)
def excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers who shipped an outsized share (>30%)
    of some small-part's one-year volume, restricted to one region: the
    nested correlated subquery (per-(part, supplier) quantity vs a
    fraction of the part's total) decorrelates into one grouped
    aggregate consumed TWICE — per-pair and re-aggregated per part —
    then a semi-join-shaped DISTINCT recovers the supplier list. The
    part filter broadcasts into the scan; quantities aggregate as exact
    decimals; the share comparison is double on both engines."""
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "SMALL")
        .select("p_partkey")
    )
    l = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    ).select("l_partkey", "l_suppkey", "l_quantity")
    scope = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("qty"))
        .persist()
    )
    tot = scope.groupBy("l_partkey").agg(F.sum("qty").alias("total_qty"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") == 2)
    return (
        scope.join(tot, ["l_partkey"])
        .filter(
            F.col("qty").cast("double") > 0.3 * F.col("total_qty").cast("double")
        )
        .join(F.broadcast(s), scope.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_suppkey", "s_name")
        .distinct()
        .orderBy("s_suppkey")
    )
