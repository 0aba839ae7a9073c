"""Oracle-checked queries for the semi-structured operator family
(unbox / unnest / relationalize / drop_null_fields)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.semistructured import (
    drop_null_fields,
    relationalize,
    unbox,
    unnest,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.queries import dsum, query, t


@query(
    "unbox_events_props",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type, k_bucket
    """,
)
def unbox_events_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unbox: parse the embedded-JSON props column with an explicit
    schema (one vectorized from_json, no inference job), then aggregate
    on an extracted field (/root/reference/awsglue/transforms/unbox.py:15-112)."""
    ev = unbox(t(spark, sf_dir, "events"), "props", "json", "k INT")
    return (
        ev.select("event_type", (F.col("props.k") % 10).alias("k_bucket"), "value")
        .groupBy("event_type", "k_bucket")
        .agg(F.count(F.lit(1)).alias("n"), dsum("value").alias("total_value"))
    )


@query(
    "unnest_nested_struct",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS "o.status",
           o_totalprice AS "o.price",
           o_orderpriority AS "o.meta.priority"
    FROM orders WHERE o_orderkey % 7 = 0
    """,
)
def unnest_nested_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnest: build a two-level nested struct, flatten it back to
    dotted top-level columns — exercises the recursive schema walk
    (/root/reference/awsglue/transforms/unnest_frame.py:15-75)."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 7 == 0)
    nested = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("price"),
            F.struct(F.col("o_orderpriority").alias("priority")).alias("meta"),
        ).alias("o"),
    )
    return unnest(nested)


@query(
    "relationalize_name_tokens",
    oracle="""
    SELECT p_partkey,
           CAST(u.idx - 1 AS INTEGER) AS "index",
           u.val AS val
    FROM (
      SELECT p_partkey,
             unnest(list_transform(string_split(p_name, ' '),
                                   (e, i) -> {'val': e, 'idx': i})) AS u
      FROM part WHERE p_partkey <= 500
    )
    """,
)
def relationalize_name_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relationalize: pivot an array column into a child table keyed by
    the root's natural key, with element index — the (joinkey, index,
    val) shape of /root/reference/awsglue/transforms/relationalize.py:16-105."""
    parts = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 500)
        .select("p_partkey", F.split("p_name", " ").alias("tokens"))
    )
    frames = relationalize(parts, "part", id_cols=["p_partkey"])
    return frames["part_tokens"]


@query(
    "resolve_choice_mixed",
    oracle="""
    SELECT o_orderkey,
           COALESCE(CASE WHEN o_orderkey % 3 = 0 THEN o_orderkey END, -1) AS resolved,
           CASE WHEN o_orderkey % 3 = 0 THEN CAST(o_orderkey AS VARCHAR)
                ELSE o_orderpriority END AS raw
    FROM orders WHERE o_orderkey <= 3000
    """,
)
def resolve_choice_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ChoiceType round trip: a column that is int in some records and
    string in others is encoded as a struct-of-variants and resolved
    with cast:bigint (SURVEY.md §2.6; /root/reference/awsglue/
    dynamicframe.py:394-434). Non-numeric records cast to NULL
    (coalesced to -1 for the oracle compare)."""
    from pyspark.sql import types as T

    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.schema import (
        ChoiceType,
        encode_choice_column,
        resolve_choice,
    )

    orders = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    mixed = orders.select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderkey").cast("string"))
        .otherwise(F.col("o_orderpriority"))
        .alias("v"),
    )
    enc = encode_choice_column(mixed, "v", ChoiceType([T.LongType(), T.StringType()]))
    resolved = resolve_choice(enc, [("v", "make_struct")])  # keep struct
    return resolved.select(
        "o_orderkey",
        F.coalesce(F.col("v.bigint"), F.lit(-1)).alias("resolved"),
        F.coalesce(F.col("v.string"), F.col("v.bigint").cast("string")).alias("raw"),
    )


@query(
    "drop_null_fields_customer",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_nationkey = 3
    """,
)
def drop_null_fields_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DropNullFields: NullType columns (here: a literal NULL added by
    an upstream union) are detected in the schema walk and dropped
    (/root/reference/awsglue/transforms/drop_nulls.py:17-42)."""
    cust = (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") == 3)
        .select("c_custkey", "c_name", "c_acctbal", F.lit(None).alias("c_legacy"))
    )
    return drop_null_fields(cust)

# --- scalar/array function surface (engine functions.py ↔ reference
# awsglue/functions.py:16-31) ------------------------------------------


@query(
    "explode_tokens_with_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      FROM documents WHERE doc_id % 10 = 0
    )
    SELECT doc_id, CAST(unnest(range(len(t))) AS INTEGER) AS idx, unnest(t) AS val
    FROM toks
    """,
)
def explode_tokens_with_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explodeWithIndex (posexplode — one narrow generator, no
    shuffle) over document tokens."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark import functions as EF
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import tokens

    docs = (
        t(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", tokens("text").alias("t"))
    )
    return EF.explode_with_index(docs, "t", "idx", "val").select("doc_id", "idx", "val")


@query(
    "replace_second_token",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
      FROM documents
    )
    SELECT doc_id,
           array_to_string(
             CASE WHEN len(t) > 1 THEN t[1:1] || ['__MASK__'] || t[3:] ELSE t END,
             ' ') AS masked
    FROM toks
    """,
)
def replace_second_token(spark: SparkSession, sf_dir: str) -> DataFrame:
    """replaceArrayElement (slice/concat rewrite, no UDF): mask the
    token at index 1 of every document."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark import functions as EF
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.text import tokens

    docs = t(spark, sf_dir, "documents").select("doc_id", tokens("text").alias("t"))
    return docs.select(
        "doc_id",
        F.concat_ws(
            " ", EF.replace_array_element("t", F.lit("__MASK__"), 1)
        ).alias("masked"),
    )
