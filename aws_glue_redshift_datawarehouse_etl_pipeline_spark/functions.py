"""Scalar/array helper functions mirroring the reference's function
surface (/root/reference/awsglue/functions.py:16-31) as pure Column
expressions — JVM-side, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def replace_array_element(src: Column | str, replacement: Column, idx: int) -> Column:
    """Replace the element at 0-based ``idx`` in an array column
    (reference: functions.py:16-19). Out-of-range indexes leave the
    array unchanged (slice semantics). Pure slice/concat — no UDF."""
    arr = _c(src)
    return F.when(
        F.size(arr) > idx,
        F.concat(
            F.slice(arr, 1, idx),
            F.array(replacement),
            F.slice(arr, idx + 2, F.greatest(F.size(arr) - idx - 1, F.lit(0))),
        ),
    ).otherwise(arr)


def named_struct(**cols: Column | str) -> Column:
    """Struct column with explicit field names
    (reference: functions.py:21-26)."""
    return F.struct(*[_c(c).alias(name) for name, c in cols.items()])


def explode_with_index(
    df: DataFrame, col: Column | str, index_name: str = "index", value_name: str = "val"
) -> DataFrame:
    """Explode an array column to (index, value) rows
    (reference: functions.py:28-31) — ``posexplode`` keeps it one
    narrow generator, no shuffle."""
    return df.select(
        *[c for c in df.columns],
        F.posexplode(_c(col)).alias(index_name, value_name),
    )
