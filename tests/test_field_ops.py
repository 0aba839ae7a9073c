from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import field_ops as fo


@pytest.fixture(scope="module")
def part(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/part.parquet")


def test_apply_mapping_shapes(part):
    out = fo.apply_mapping(
        part,
        [("p_partkey", "long", "id", "int"), ("p_name", "name"), ("p_size", "sz", "string")],
    )
    assert out.columns == ["id", "name", "sz"]
    assert dict(out.dtypes) == {"id": "int", "name": "string", "sz": "string"}


def test_apply_mapping_bad_tuple(part):
    with pytest.raises(ValueError):
        fo.apply_mapping(part, [("a",)])


def test_positional_rename(part):
    out = fo.positional_rename(part, ["a", "b"])
    assert out.columns[:2] == ["a", "b"]
    assert out.columns[2:] == part.columns[2:]
    with pytest.raises(ValueError):
        fo.positional_rename(part.select("p_partkey"), ["a", "b"])


def test_split_fields_partition(part):
    sides = fo.split_fields(part, ["p_partkey", "p_name"])
    assert sides["selected"].columns == ["p_partkey", "p_name"]
    assert set(sides["rest"].columns) == set(part.columns) - {"p_partkey", "p_name"}


def test_split_rows_is_partition(part):
    sides = fo.split_rows(part, {"p_size": {">": 10, "<=": 40}})
    n = part.count()
    assert sides["matched"].count() + sides["unmatched"].count() == n
    assert sides["matched"].filter(~((F.col("p_size") > 10) & (F.col("p_size") <= 40))).count() == 0


def test_split_rows_null_partition(spark):
    df = spark.createDataFrame([(1,), (None,), (50,)], "x int")
    sides = fo.split_rows(df, {"x": {">": 10}})
    assert sides["matched"].count() == 1
    assert sides["unmatched"].count() == 2  # NULL lands in unmatched


def test_nested_field_ops(spark):
    df = spark.createDataFrame([(1, (2, 3))], "a int, s struct<x:int,y:int>")
    dropped = fo.drop_fields(df, ["s.x"])
    assert dropped.select("s.*").columns == ["y"]
    renamed = fo.rename_field(df, "s.x", "z")
    assert sorted(renamed.select("s.*").columns) == ["y", "z"]
    assert renamed.select(F.col("s.z")).first()[0] == 2


def test_ingestion_time_columns(part):
    out = fo.add_ingestion_time_columns(part.limit(1), "hour")
    assert [c for c in out.columns if c.startswith("ingest_")] == [
        "ingest_year",
        "ingest_month",
        "ingest_day",
        "ingest_hour",
    ]
    with pytest.raises(ValueError):
        fo.add_ingestion_time_columns(part, "decade")
