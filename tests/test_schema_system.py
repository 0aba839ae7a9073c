from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.schema import (
    ChoiceType,
    EnumType,
    encode_choice_column,
    merge_data_types,
    resolve_choice,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.schema.choice import (
    UnknownType,
    infer_union_schema,
    merge_schemas,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.schema.ddl import parse_ddl

ATOMS = [
    T.LongType(),
    T.IntegerType(),
    T.DoubleType(),
    T.StringType(),
    T.BooleanType(),
    T.TimestampType(),
]


def test_merge_identity_null_unknown():
    for dt in ATOMS:
        assert merge_data_types(UnknownType(), dt) == dt
        assert merge_data_types(dt, T.NullType()) == dt
        assert merge_data_types(dt, dt) == dt


@settings(max_examples=50, deadline=None)
@given(st.sampled_from(ATOMS), st.sampled_from(ATOMS))
def test_merge_commutative(a, b):
    ab, ba = merge_data_types(a, b), merge_data_types(b, a)
    assert ab == ba


@settings(max_examples=50, deadline=None)
@given(st.sampled_from(ATOMS), st.sampled_from(ATOMS), st.sampled_from(ATOMS))
def test_merge_associative(a, b, c):
    left = merge_data_types(merge_data_types(a, b), c)
    right = merge_data_types(a, merge_data_types(b, c))
    assert left == right


def test_choice_duplicate_raises():
    ch = ChoiceType([T.LongType()])
    with pytest.raises(ValueError):
        ch.add(T.LongType())


def test_struct_merge_keeps_one_sided_fields():
    a = T.StructType([T.StructField("x", T.LongType()), T.StructField("y", T.StringType())])
    b = T.StructType([T.StructField("x", T.StringType()), T.StructField("z", T.DoubleType())])
    m = merge_schemas(a, b)
    assert [f.name for f in m.fields] == ["x", "y", "z"]
    # x became an encoded choice struct
    assert isinstance(m["x"].dataType, T.StructType)
    assert sorted(f.name for f in m["x"].dataType.fields) == ["bigint", "string"]


def test_enum_merge_concatenates():
    m = merge_data_types(EnumType(frozenset({"a"})), EnumType(frozenset({"b"})))
    assert m == EnumType(frozenset({"a", "b"}))


def test_infer_union_schema_mixed():
    schema = infer_union_schema([{"k": 1}, {"k": "x"}, {"k": None}, {"j": 1.5}])
    assert isinstance(schema["k"], ChoiceType)
    assert sorted(schema["k"].choices) == ["bigint", "string"]
    assert schema["j"] == T.DoubleType()


def test_encode_and_resolve_choice(spark):
    df = spark.createDataFrame([("1",), ("abc",), ("2",), (None,)], "v string")
    ch = ChoiceType([T.LongType(), T.StringType()])
    enc = encode_choice_column(df, "v", ch)
    assert sorted(f.name for f in enc.schema["v"].dataType.fields) == ["bigint", "string"]

    as_int = resolve_choice(enc, [("v", "cast:bigint")])
    assert [r.v for r in as_int.orderBy(F.col("v").asc_nulls_last()).collect()] == [1, 2, None, None]

    proj = resolve_choice(enc, [("v", "project:string")])
    vals = {r.v for r in proj.collect()}
    assert vals == {"abc", None}

    kept = resolve_choice(enc, [("v", "make_struct")])
    assert isinstance(kept.schema["v"].dataType, T.StructType)

    cat = T.StructType([T.StructField("v", T.StringType())])
    matched = resolve_choice(enc, [("v", "match_catalog")], catalog_schema=cat)
    assert dict(matched.dtypes)["v"] == "string"

    with pytest.raises(ValueError):
        resolve_choice(enc, [("v", "project:double")])
    with pytest.raises(ValueError):
        resolve_choice(enc, [("v", "explode")])


def test_resolve_choice_global_default(spark):
    df = spark.createDataFrame([("1",), ("x",)], "v string")
    enc = encode_choice_column(df, "v", ChoiceType([T.LongType(), T.StringType()]))
    out = resolve_choice(enc, choice="cast:string")
    assert dict(out.dtypes)["v"] == "string"


def test_parse_reference_shaped_ddl():
    ddl = """
    CREATE TABLE "FactInternetSalesReason" (
      "SalesOrderNumber" INTEGER NOT NULL,
      "SalesOrderLineNumber" INTEGER,
      "SalesReasonKey" INTEGER,
      PRIMARY KEY ("SalesOrderNumber", "SalesOrderLineNumber")
    ) SORTKEY("SalesOrderNumber");
    CREATE TABLE DimCurrency (
      CurrencyKey VARCHAR(3) PRIMARY KEY,
      CurrencyAlternateKey VARCHAR(50),
      Amount DECIMAL(12, 2),
      Added TIMESTAMP
    );
    """
    tables = parse_ddl(ddl)
    fact = tables["FactInternetSalesReason"]
    assert fact.schema["SalesOrderNumber"].dataType == T.IntegerType()
    assert not fact.schema["SalesOrderNumber"].nullable
    assert fact.primary_key == ["SalesOrderNumber", "SalesOrderLineNumber"]
    assert fact.sort_keys == ["SalesOrderNumber"]
    dim = tables["DimCurrency"]
    assert dim.schema["CurrencyKey"].dataType == T.StringType()
    assert dim.primary_key == ["CurrencyKey"]
    assert dim.schema["Amount"].dataType == T.DecimalType(12, 2)
    assert dim.schema["Added"].dataType == T.TimestampType()
