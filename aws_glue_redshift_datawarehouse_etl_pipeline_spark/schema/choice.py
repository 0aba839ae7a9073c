"""Schema-on-read union ("choice") typing — the defining non-Spark
feature of the reference's type system, rebuilt as a pure-Python
lattice over ``pyspark.sql.types``.

Semantics from /root/reference/awsglue/gluetypes.py:
- merge of Unknown/Null with X yields X (:396-399)
- merge of two different atomic types yields a ChoiceType (:400-403)
- structs merge field-by-field, keeping one-sided fields (:405-424)
- arrays/maps merge element-wise (:425-428)
- enums concatenate options (:429-430)
- inserting a duplicate variant into a choice raises (:209-213)

The lattice runs only at ingest (sampling-based inference); execution
is always plain Spark types — a choice column is *encoded* as a
struct-of-variants (Glue's own "make_struct" resolution) and resolved
before any relational operator touches it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

# Engine-side union member: either a Spark DataType or one of the
# sidecar types below.
DataTypeLike = "T.DataType | ChoiceType | EnumType | UnknownType"


@dataclass(frozen=True)
class UnknownType:
    """Type of a field never observed non-null (gluetypes.py UnknownType);
    yields to any other type on merge, lands as NullType if unresolved."""

    def simpleString(self) -> str:
        return "unknown"


@dataclass(frozen=True)
class EnumType:
    """String with a closed option set (gluetypes.py:96-110). Spark-side
    it is a StringType; the options ride along for validation."""

    options: frozenset[str] = field(default_factory=frozenset)

    def simpleString(self) -> str:
        return f"enum({','.join(sorted(self.options))})"


def _type_key(dt) -> str:
    """Variant key for a choice member — the reference keys choices by
    typeName() (gluetypes.py:205-213); Integer's name is 'int'."""
    if isinstance(dt, ChoiceType):
        raise ValueError("nested ChoiceType is not allowed")
    if isinstance(dt, (EnumType, UnknownType)):
        return dt.simpleString()
    return dt.simpleString()


class ChoiceType:
    """A column whose values have different types across records, keyed
    by type name (gluetypes.py:194-230)."""

    def __init__(self, choices=()):
        self._choices: dict[str, T.DataType] = {}
        for c in choices:
            self.add(c)

    def add(self, dt) -> None:
        key = _type_key(dt)
        if key in self._choices:
            raise ValueError(f"duplicate choice variant {key!r}")
        self._choices[key] = dt

    @property
    def choices(self) -> dict[str, T.DataType]:
        return dict(self._choices)

    def merge(self, other: "ChoiceType") -> "ChoiceType":
        out = ChoiceType(self._choices.values())
        for dt in other._choices.values():
            if _type_key(dt) not in out._choices:
                out.add(dt)
        return out

    def spark_struct(self) -> T.StructType:
        """The struct-of-variants physical encoding: one nullable field
        per variant, named by type key. Deterministic field order (sorted)
        so plans are stable across runs."""
        return T.StructType(
            [
                T.StructField(k, self._choices[k], True)
                for k in sorted(self._choices)
            ]
        )

    def simpleString(self) -> str:
        return f"choice<{','.join(sorted(self._choices))}>"

    def __eq__(self, other) -> bool:
        return isinstance(other, ChoiceType) and self.choices == other.choices

    def __repr__(self) -> str:
        return self.simpleString()


def _is_unknown(dt) -> bool:
    return isinstance(dt, (UnknownType, T.NullType))


def merge_data_types(a, b):
    """Recursive union of two inferred types (mergeDataTypes,
    /root/reference/awsglue/gluetypes.py:395-432)."""
    if _is_unknown(a):
        return b
    if _is_unknown(b):
        return a
    if isinstance(a, ChoiceType) and isinstance(b, ChoiceType):
        return a.merge(b)
    if isinstance(a, ChoiceType):
        return a.merge(ChoiceType([b]))
    if isinstance(b, ChoiceType):
        return ChoiceType([a]).merge(b)
    if isinstance(a, EnumType) and isinstance(b, EnumType):
        return EnumType(a.options | b.options)
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        names = list(dict.fromkeys([f.name for f in a.fields] + [f.name for f in b.fields]))
        af = {f.name: f for f in a.fields}
        bf = {f.name: f for f in b.fields}
        fields = []
        for n in names:
            if n in af and n in bf:
                merged = merge_data_types(af[n].dataType, bf[n].dataType)
                if isinstance(merged, (ChoiceType, EnumType, UnknownType)):
                    # physical encoding inside a struct schema
                    merged = (
                        merged.spark_struct()
                        if isinstance(merged, ChoiceType)
                        else T.StringType()
                        if isinstance(merged, EnumType)
                        else T.NullType()
                    )
                fields.append(T.StructField(n, merged, True))
            else:
                fields.append((af.get(n) or bf[n]))
        return T.StructType(fields)
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        elem = merge_data_types(a.elementType, b.elementType)
        if isinstance(elem, ChoiceType):
            elem = elem.spark_struct()
        return T.ArrayType(elem, a.containsNull or b.containsNull)
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        val = merge_data_types(a.valueType, b.valueType)
        if isinstance(val, ChoiceType):
            val = val.spark_struct()
        return T.MapType(a.keyType, val, a.valueContainsNull or b.valueContainsNull)
    if a == b:
        return a
    return ChoiceType([a, b])


def merge_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Union-merge two frame schemas (the reference's union/inference
    path, gluetypes.py:405-424)."""
    merged = merge_data_types(a, b)
    assert isinstance(merged, T.StructType)
    return merged


# --- sampling-based inference over raw Python values --------------------


def infer_value_type(v):
    """Inferred engine type of one Python value (JSON-ish ingest)."""
    if v is None:
        return UnknownType()
    if isinstance(v, bool):
        return T.BooleanType()
    if isinstance(v, int):
        return T.LongType()
    if isinstance(v, float):
        return T.DoubleType()
    if isinstance(v, str):
        return T.StringType()
    if isinstance(v, dict):
        return T.StructType(
            [
                T.StructField(
                    k,
                    _concrete(infer_value_type(x)),
                    True,
                )
                for k, x in v.items()
            ]
        )
    if isinstance(v, (list, tuple)):
        elem = UnknownType()
        for x in v:
            elem = merge_data_types(elem, infer_value_type(x))
        return T.ArrayType(_concrete(elem), True)
    raise TypeError(f"cannot infer type of {type(v).__name__}")


def _concrete(dt):
    if isinstance(dt, ChoiceType):
        return dt.spark_struct()
    if isinstance(dt, UnknownType):
        return T.NullType()
    if isinstance(dt, EnumType):
        return T.StringType()
    return dt


def infer_union_schema(records: list[dict]) -> dict[str, object]:
    """Merge per-record inferred types across a sample into a
    column->type map (values may be ChoiceType) — the engine's
    schema-on-read ingest inference."""
    out: dict[str, object] = {}
    for rec in records:
        for k, v in rec.items():
            dt = infer_value_type(v)
            out[k] = merge_data_types(out[k], dt) if k in out else dt
    return out
