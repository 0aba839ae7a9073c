"""Set operators.

The reference's Union merges schemas per its type lattice
(/root/reference/awsglue/dynamicframe.py:463-475 + gluetypes
mergeDataTypes); here that is ``unionByName(allowMissingColumns=True)``
plus an optional widening pass so differing atomic types don't fail the
union. Intersect/except are stock Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _widen(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """Smallest common Spark type for two atomic types, or None if the
    pair needs a ChoiceType (handled by the schema layer, gluetypes.py)."""
    if a == b:
        return a
    numeric_order = [
        T.ByteType(),
        T.ShortType(),
        T.IntegerType(),
        T.LongType(),
        T.FloatType(),
        T.DoubleType(),
    ]
    if a in numeric_order and b in numeric_order:
        return numeric_order[max(numeric_order.index(a), numeric_order.index(b))]
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if T.StringType() in (a, b):
        return T.StringType()
    return None


def union_by_name(a: DataFrame, b: DataFrame, widen: bool = True) -> DataFrame:
    """Bag union honoring the reference's schema-merge semantics:
    columns matched by name, one-sided columns null-filled, numeric
    types widened, irreconcilable pairs stringified (the engine's
    choice columns resolve before a union)."""
    if widen:
        a_fields = {f.name: f.dataType for f in a.schema.fields}
        b_fields = {f.name: f.dataType for f in b.schema.fields}
        for name in set(a_fields) & set(b_fields):
            ta, tb = a_fields[name], b_fields[name]
            if ta != tb:
                target = _widen(ta, tb) or T.StringType()
                if ta != target:
                    a = a.withColumn(name, F.col(name).cast(target))
                if tb != target:
                    b = b.withColumn(name, F.col(name).cast(target))
    return a.unionByName(b, allowMissingColumns=True)
