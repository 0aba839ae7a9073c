from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.plans import (
    DimensionSpec,
    FactSpec,
    load_dimension,
    load_fact,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources import (
    WarehouseCatalog,
    read_source,
    read_tsv,
    write_sink,
)

DIM_SPEC = DimensionSpec(
    table="dim_part",
    mappings=[
        ("p_partkey", "long", "PartKey", "int"),
        ("p_name", "PartAlternateKey", "string"),
        ("p_brand", "Brand"),
    ],
    keys=["PartKey"],
    sort_keys=["PartKey"],
)


def test_dimension_load_idempotent(spark, sf_dir, tmp_path):
    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    part = spark.read.parquet(f"{sf_dir}/part.parquet")

    first = load_dimension(part, DIM_SPEC, cat)
    assert first.inserted == part.count()
    # loading the same batch again inserts nothing (pipeline.py's core invariant)
    second = load_dimension(part, DIM_SPEC, cat)
    assert second.inserted == 0
    assert cat.read_table("dim_part").count() == first.inserted

    # an incremental batch with 10 new keys inserts exactly 10
    extra = part.limit(10).withColumn("p_partkey", F.col("p_partkey") + 10_000_000)
    third = load_dimension(extra, DIM_SPEC, cat)
    assert third.inserted == 10


def test_fact_load_composite_key(spark, sf_dir, tmp_path):
    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    spec = FactSpec(
        table="fact_sales",
        left_keys=["l_orderkey"],
        right_keys=["o_orderkey"],
        mappings=[
            ("l_orderkey", "OrderKey"),
            ("l_partkey", "PartKey"),
            ("l_suppkey", "SuppKey"),
            ("l_linenumber", "LineNumber"),
            ("l_quantity", "Quantity"),
            ("o_custkey", "CustomerKey"),
            ("o_orderdate", "OrderDate"),
        ],
        anti_keys=["OrderKey", "PartKey", "SuppKey", "LineNumber"],
        sort_keys=["OrderKey"],
        broadcast_right=True,
    )
    first = load_fact(li, orders, spec, cat)
    assert first.inserted == li.count()  # every lineitem has its order
    second = load_fact(li, orders, spec, cat)
    assert second.inserted == 0


def test_bookmark_incremental_read(spark, sf_dir, tmp_path):
    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    assert cat.incremental_read(orders, "orders", "o_orderdate").count() == orders.count()
    cat.commit_bookmark("orders", orders.filter("o_orderdate < '1997-01-01'"), "o_orderdate")
    remaining = cat.incremental_read(orders, "orders", "o_orderdate")
    assert 0 < remaining.count() < orders.count()
    assert remaining.filter("o_orderdate < '1997-01-01'").count() == 0


def test_read_tsv_and_source_dispatch(spark, sf_dir, tmp_path):
    # round-trip: parquet → tsv on disk → read_tsv with positional names
    part = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_name")
    tsv_dir = str(tmp_path / "tsv")
    part.write.option("sep", "\t").mode("overwrite").csv(tsv_dir)
    back = read_tsv(spark, tsv_dir, names=["id", "name"])
    assert back.columns == ["id", "name"]
    assert back.count() == part.count()
    assert dict(back.dtypes)["id"] == "string"  # headerless TSV: all strings

    df = read_source(
        spark,
        "file",
        {"path": f"{sf_dir}/orders.parquet"},
        fmt="parquet",
        push_down_predicate="o_orderkey < 100",
    )
    assert df.count() == df.filter("o_orderkey < 100").count()

    with pytest.raises(ValueError):
        read_source(spark, "file", {}, fmt="parquet")
    with pytest.raises(ValueError):
        read_source(spark, "dynamo", {})
    with pytest.raises(ValueError):
        read_source(spark, "jdbc", {"url": "jdbc:x"})


def test_write_sink_partitioned(spark, sf_dir, tmp_path):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(100)
    out = str(tmp_path / "out")
    write_sink(
        orders.withColumn("status", F.col("o_orderstatus")),
        "file",
        {"path": out},
        fmt="parquet",
        mode="overwrite",
        partition_by=["status"],
    )
    back = spark.read.parquet(out)
    assert back.count() == 100
    import os

    assert any(d.startswith("status=") for d in os.listdir(out))


def test_catalog_schema_lookup_and_write_frame(spark, tmp_path):
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.frame import EngineFrame
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import WarehouseCatalog
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.registry import write_frame

    cat = WarehouseCatalog(spark, str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    cat.write_table(df, "t")
    schema = cat.get_table_schema("t")
    assert [(f.name, f.dataType.simpleString()) for f in schema.fields] == [
        ("k", "bigint"),
        ("v", "string"),
    ]

    errs = write_frame(
        EngineFrame(df, name="t"),
        "file",
        {"path": str(tmp_path / "out")},
        fmt="parquet",
        mode="overwrite",
    )
    assert errs.count() == 0  # DataSink.writeFrame returns the error companion
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1


def test_format_round_trips_through_registry(spark, tmp_path):
    """Every file format the source registry dispatches (csv/tsv/json/
    parquet/orc/text round-trip through write_sink → read_source with
    identical rows — the from_options matrix the reference's format
    registry promises (avro goes through the jar-less codec path,
    covered in tests/test_avro_codec.py)."""
    base = spark.range(50).selectExpr(
        "id", "concat('name_', id) AS name", "CAST(id * 1.5 AS DOUBLE) AS score"
    )
    for fmt in ("csv", "json", "parquet", "orc"):
        path = str(tmp_path / f"rt_{fmt}")
        fopts = {"header": "true"} if fmt == "csv" else {}
        write_sink(base, "file", options={"path": path, **fopts}, fmt=fmt)
        ropts = {"path": path, **fopts}
        if fmt == "csv":
            ropts["inferSchema"] = "true"
        back = read_source(spark, "file", options=ropts, fmt=fmt)
        assert back.count() == 50, fmt
        got = {r.id: (r.name, float(r.score)) for r in back.collect()}
        assert got[7] == ("name_7", 10.5), fmt
