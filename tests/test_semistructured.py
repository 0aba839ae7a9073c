from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators import semistructured as ss


def test_unnest_two_levels(spark):
    df = spark.createDataFrame(
        [(1, ((2, 3), "x"))], "a int, s struct<inner:struct<p:int,q:int>, tag:string>"
    )
    out = ss.unnest(df)
    assert out.columns == ["a", "s.inner.p", "s.inner.q", "s.tag"]
    assert out.first()[1] == 2


def test_relationalize_synthetic_id_consistent(spark):
    df = spark.createDataFrame(
        [("a", [1, 2]), ("b", [3]), ("c", [])], "k string, xs array<int>"
    )
    frames = ss.relationalize(df, "root")
    root, child = frames["root"], frames["root_xs"]
    assert "xs" not in root.columns
    # posexplode_outer keeps empty-array rows with null index
    assert child.count() == 4
    joined = root.join(child, "__rid").filter(F.col("index").isNotNull())
    vals = sorted((r["k"], r["index"], r["val"]) for r in joined.collect())
    assert vals == [("a", 0, 1), ("a", 1, 2), ("b", 0, 3)]


def test_unbox_json_infers_schema(spark):
    df = spark.createDataFrame([('{"a": 1, "b": "x"}',), ('{"a": 2}',)], "j string")
    out = ss.unbox(df, "j", "json")
    assert isinstance(out.schema["j"].dataType, T.StructType)
    assert out.select("j.a").rdd.map(lambda r: r[0]).collect() == [1, 2]


def test_unbox_csv(spark):
    df = spark.createDataFrame([("1|x",), ("2|y",)], "line string")
    out = ss.unbox(df, "line", "csv", schema="a INT, b STRING", separator="|")
    assert out.select("line.b").rdd.map(lambda r: r[0]).collect() == ["x", "y"]


def test_unbox_bad_format(spark):
    df = spark.createDataFrame([("x",)], "c string")
    with pytest.raises(ValueError):
        ss.unbox(df, "c", "orc")
    # avro without an explicit schema is a usage error, not a format error
    with pytest.raises(ValueError, match="Avro"):
        ss.unbox(df.select(F.col("c").cast("binary").alias("c")), "c", "avro")


_AVRO_SCHEMA = (
    '{"type": "record", "name": "rec", "fields": ['
    '{"name": "a", "type": "int"}, {"name": "b", "type": "string"}]}'
)


def test_unbox_avro_roundtrip(spark):
    """Avro unbox routes through from_avro with an explicit schema
    (reference format list, awsglue/transforms/unbox.py:15-112) when
    the external spark-avro module is on the classpath, and through the
    pure-Python Arrow-batched codec (operators/avro_codec.py) when it
    isn't — either way the round trip must execute here. The encode
    side uses the portable codec (to_avro needs the jar too)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.avro_codec import (
        avro_encode,
        parse_avro_schema,
    )

    sch = parse_avro_schema(_AVRO_SCHEMA)
    rows = [
        (avro_encode({"a": 1, "b": "x"}, sch),),
        (avro_encode({"a": 2, "b": "y"}, sch),),
        (None,),
    ]
    enc = spark.createDataFrame(rows, "rec binary")
    out = ss.unbox(enc, "rec", "avro", schema=_AVRO_SCHEMA)
    assert out.schema["rec"].dataType.simpleString() == "struct<a:int,b:string>"
    got = sorted(
        (r[0], r[1]) for r in out.select("rec.a", "rec.b").collect() if r[0] is not None
    )
    assert got == [(1, "x"), (2, "y")]
    assert out.filter(F.col("rec").isNull()).count() == 1


def test_drop_null_fields_nested(spark):
    df = spark.createDataFrame([(1, None)], "a int, b void").select(
        "a", "b", F.struct(F.lit(None).alias("n"), F.lit(2).alias("k")).alias("s")
    )
    out = ss.drop_null_fields(df)
    assert out.columns == ["a", "s"]
    assert out.select("s.*").columns == ["k"]


def test_unnest_ddb_json(spark):
    df = spark.createDataFrame(
        [(("5",), ("hello",))],
        "n struct<N:string>, s struct<S:string>",
    )
    out = ss.unnest_ddb_json(df)
    row = out.first()
    assert row.n == 5.0 and row.s == "hello"


def test_unbox_with_errors_routes_malformed_to_error_channel(spark):
    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": "x"}'),
            (2, "not json at all {{"),
            (3, None),
            (4, '{"a": 4, "b": "y"}'),
        ],
        "id long, payload string",
    )
    ef = ss.unbox_with_errors(df, "payload", "json", schema="a INT, b STRING")
    rows = {r.id: r for r in ef.df.collect()}
    # good rows parsed; NULL source passes through as NULL struct
    assert rows[1].payload.a == 1 and rows[4].payload.b == "y"
    assert rows[3].payload is None
    assert 2 not in rows
    errs = ef.errors_frame().collect()
    assert len(errs) == 1 and errs[0].stage == "unbox_json"
    assert "not json" in errs[0].record
    with pytest.raises(RuntimeError, match="error records"):
        ef.assert_error_threshold(0)
    ef.assert_error_threshold(1)
