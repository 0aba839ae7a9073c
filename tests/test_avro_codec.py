"""Unit + property tests for the pure-Python Avro binary codec
(operators/avro_codec.py) — the jar-less fallback behind
``unbox(..., fmt="avro")``. Encoding per the public Avro spec:
zigzag varint ints/longs, length-prefixed bytes/strings, block
arrays/maps, index-prefixed unions, field-concatenated records."""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.avro_codec import (
    avro_decode,
    avro_encode,
    avro_schema_to_spark_type,
    parse_avro_schema,
)


def roundtrip(val, schema):
    sch = parse_avro_schema(schema)
    return avro_decode(avro_encode(val, sch), sch)


# ------------------------------------------------------- wire-format pins

def test_zigzag_long_wire_bytes():
    # spec examples: 0->00, -1->01, 1->02, -2->03, 2->04
    for v, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"), (2, b"\x04")]:
        assert avro_encode(v, "long") == b, v
    # multi-byte varint: 64 -> 0x80 0x01
    assert avro_encode(64, "long") == b"\x80\x01"


def test_string_wire_bytes():
    # length (zigzag 3 = 0x06) + utf-8 bytes
    assert avro_encode("foo", "string") == b"\x06foo"


def test_record_is_field_concatenation():
    sch = (
        '{"type":"record","name":"r","fields":'
        '[{"name":"a","type":"long"},{"name":"b","type":"string"}]}'
    )
    assert avro_encode({"a": 1, "b": "x"}, parse_avro_schema(sch)) == b"\x02\x02x"


def test_union_null_branch_index():
    sch = parse_avro_schema('["null","long"]')
    assert avro_encode(None, sch) == b"\x00"  # branch 0
    assert avro_encode(5, sch) == b"\x02\x0a"  # branch 1 then zigzag(5)


def test_array_block_form_with_size_prefix_decodes():
    # negative count block: abs(count) items preceded by a byte size —
    # writers may emit it for skippability; the decoder must accept it.
    # [-1 zigzag]=01, [size 2 zigzag]=04, items 1,2 as zigzag, terminator 00
    buf = b"\x03\x04\x02\x04\x00"
    sch = parse_avro_schema('{"type":"array","items":"long"}')
    assert avro_decode(buf, sch) == [1, 2]


def test_trailing_garbage_rejected():
    with pytest.raises(ValueError, match="trailing"):
        avro_decode(b"\x02\xff", "long")


def test_unknown_type_name_rejected():
    with pytest.raises(ValueError, match="unknown"):
        parse_avro_schema('{"type":"array","items":"wat"}')


def test_named_type_reference_resolves():
    sch = parse_avro_schema(
        '{"type":"record","name":"outer","fields":['
        '{"name":"p","type":{"type":"record","name":"pt","fields":'
        '[{"name":"x","type":"int"}]}},'
        '{"name":"q","type":"pt"}]}'
    )
    v = {"p": {"x": 1}, "q": {"x": 2}}
    assert avro_decode(avro_encode(v, sch), sch) == v


# ---------------------------------------------------------- round trips

def test_scalar_roundtrips():
    assert roundtrip(True, "boolean") is True
    assert roundtrip(-(2**62), "long") == -(2**62)
    assert roundtrip(3.5, "double") == 3.5
    assert roundtrip(b"\x00\xff", "bytes") == b"\x00\xff"
    assert roundtrip("héllo", "string") == "héllo"
    assert roundtrip(None, "null") is None


def test_enum_fixed_map_roundtrip():
    sch = parse_avro_schema(
        '{"type":"record","name":"r","fields":['
        '{"name":"e","type":{"type":"enum","name":"col","symbols":["R","G","B"]}},'
        '{"name":"f","type":{"type":"fixed","name":"f4","size":4}},'
        '{"name":"m","type":{"type":"map","values":"long"}}]}'
    )
    v = {"e": "G", "f": b"abcd", "m": {"k1": 1, "k2": -2}}
    assert avro_decode(avro_encode(v, sch), sch) == v


@settings(max_examples=200, deadline=None)
@given(
    st.recursive(
        st.one_of(
            st.none(),
            st.booleans(),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
            st.text(max_size=20),
        ),
        lambda children: st.lists(children, max_size=4),
        max_leaves=10,
    )
)
def test_property_roundtrip_dynamic_union(value):
    """Any nesting of null/bool/long/string/array survives the codec
    through a recursive union schema."""
    sch = parse_avro_schema(
        '["null","boolean","long","string",{"type":"array","items":'
        '["null","boolean","long","string",{"type":"array","items":'
        '["null","boolean","long","string",{"type":"array","items":'
        '["null","boolean","long","string"]}]}]}]'
    )

    def fits(v, depth=0):
        if isinstance(v, list):
            return depth < 3 and all(fits(x, depth + 1) for x in v)
        return True

    if not fits(value):
        return
    assert avro_decode(avro_encode(value, sch), sch) == value


@settings(max_examples=100, deadline=None)
@given(st.floats(allow_nan=True, allow_infinity=True, width=64))
def test_property_double_bits_preserved(x):
    got = roundtrip(x, "double")
    assert (math.isnan(got) and math.isnan(x)) or got == x


# ----------------------------------------------------- spark type mapping

def test_spark_type_mapping_matches_from_avro_shapes():
    sch = (
        '{"type":"record","name":"r","fields":['
        '{"name":"a","type":"int"},'
        '{"name":"b","type":["null","string"]},'
        '{"name":"c","type":{"type":"array","items":"double"}},'
        '{"name":"d","type":{"type":"map","values":"long"}},'
        '{"name":"e","type":{"type":"enum","name":"s","symbols":["A"]}},'
        '{"name":"f","type":{"type":"fixed","name":"f8","size":8}}]}'
    )
    t = avro_schema_to_spark_type(parse_avro_schema(sch))
    assert t.simpleString() == (
        "struct<a:int,b:string,c:array<double>,d:map<string,bigint>,"
        "e:string,f:binary>"
    )


def test_union_accepts_int_for_double_branch():
    """Python ints coerce into float/double union branches, mirroring
    the scalar encoder's float(val) coercion; bool stays excluded."""
    assert avro_decode(avro_encode(1, ["null", "double"]), ["null", "double"]) == 1.0
    assert avro_decode(avro_encode(2, ["null", "float"]), ["null", "float"]) == 2.0
    # int branch still wins when present (first-match union semantics)
    assert avro_decode(avro_encode(3, ["int", "double"]), ["int", "double"]) == 3
    with pytest.raises(ValueError):
        avro_encode(True, ["null", "double"])


def test_jvm_avro_parity(spark):
    """When the spark-avro jar is on the classpath (opt-in via
    SPARK_GRAFT_AVRO_JARS=1 in session.get_spark), the JVM from_avro /
    to_avro and the pure-Python codec must agree byte-for-byte on the
    same schema. Skips with reason where the jar is absent — the
    pure-Python path is the default and is pinned by the wire-format
    tests above."""
    import json as _json

    from pyspark.sql import functions as F

    schema = {
        "type": "record",
        "name": "r",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "s", "type": "string"},
            {"name": "d", "type": "double"},
        ],
    }
    rows = [{"a": 1, "s": "x", "d": 1.5}, {"a": -7, "s": "héllo", "d": -0.25}]
    blobs = [(i, bytearray(avro_encode(r, schema))) for i, r in enumerate(rows)]
    df = spark.createDataFrame(blobs, "i long, payload binary")
    try:
        from pyspark.sql.avro.functions import from_avro, to_avro

        decoded = (
            df.select("i", from_avro("payload", _json.dumps(schema)).alias("r"))
            .select("i", "r.a", "r.s", "r.d")
            .collect()
        )
    except Exception as exc:  # noqa: BLE001 — jar absence is env-specific
        pytest.skip(
            "spark-avro jar not on classpath (set SPARK_GRAFT_AVRO_JARS=1 "
            f"to enable the JVM path): {type(exc).__name__}"
        )
    got = {r["i"]: {"a": r["a"], "s": r["s"], "d": r["d"]} for r in decoded}
    assert got == {i: r for i, r in enumerate(rows)}
    # reverse direction: JVM-encoded bytes decode with the Python codec
    back = df.select(
        "i", to_avro(F.struct("i"), _json.dumps(
            {"type": "record", "name": "w",
             "fields": [{"name": "i", "type": "long"}]})).alias("b")
    ).collect()
    for r in back:
        assert avro_decode(bytes(r["b"]),
                           {"type": "record", "name": "w",
                            "fields": [{"name": "i", "type": "long"}]}) == {"i": r["i"]}
