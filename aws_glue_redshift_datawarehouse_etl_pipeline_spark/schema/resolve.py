"""Choice-column encoding and resolution.

A choice column is physically a struct-of-variants (field per variant
type, exactly Glue's ``make_struct`` representation). ``resolveChoice``
actions (/root/reference/awsglue/dynamicframe.py:394-434 and
context.py:438-449) become plain column rewrites — no execution-time
per-record typing ever reaches Catalyst.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.schema.choice import ChoiceType

_INT_RE = r"^-?\d+$"
_FLOAT_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"
_BOOL_RE = r"^(?i)(true|false)$"


def _variant_from_string(raw: Column, dt: T.DataType) -> Column:
    """Populate one variant from a raw string value: the variant holds
    the value only when the string lexically belongs to that type
    (mirrors crawler-style choice detection on untyped ingest)."""
    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return F.when(raw.rlike(_INT_RE), raw.try_cast(dt))
    if isinstance(dt, (T.DoubleType, T.FloatType)) or isinstance(dt, T.DecimalType):
        return F.when(raw.rlike(_FLOAT_RE) & ~raw.rlike(_INT_RE), raw.try_cast(dt))
    if isinstance(dt, T.BooleanType):
        return F.when(raw.rlike(_BOOL_RE), raw.try_cast(dt))
    if isinstance(dt, T.StringType):
        # string variant catches values no typed variant claims
        return F.when(
            ~raw.rlike(_INT_RE) & ~raw.rlike(_FLOAT_RE) & ~raw.rlike(_BOOL_RE), raw
        )
    return raw.try_cast(dt)


def encode_choice_column(df: DataFrame, col: str, choice: ChoiceType) -> DataFrame:
    """Rewrite a raw string column into its struct-of-variants encoding:
    ``col`` becomes struct<int:..., string:..., ...> with exactly one
    non-null variant per record."""
    struct = choice.spark_struct()
    raw = F.col(col).cast("string")
    variants = [
        _variant_from_string(raw, f.dataType).alias(f.name) for f in struct.fields
    ]
    return df.withColumn(col, F.struct(*variants))


def _is_choice_struct(df: DataFrame, col: str) -> bool:
    dt = df.schema[col].dataType
    return isinstance(dt, T.StructType) and all(
        f.name in {"int", "bigint", "smallint", "tinyint", "double", "float",
                   "string", "boolean", "date", "timestamp"}
        or f.name.startswith("decimal")
        for f in dt.fields
    )


def resolve_choice(
    df: DataFrame,
    specs: Sequence[tuple[str, str]] = (),
    choice: str = "",
    catalog_schema: T.StructType | None = None,
) -> DataFrame:
    """Apply resolveChoice actions to encoded choice columns.

    Actions (ResolveOption, /root/reference/awsglue/dynamicframe.py:31-44):
      - ``cast:<type>``  — coalesce every variant cast to <type>
      - ``project:<type>`` — keep only the variant named <type>
      - ``make_struct``  — keep the struct-of-variants encoding
      - ``match_catalog`` — cast to ``catalog_schema``'s type for the column
    ``choice`` is the global default action applied to every choice
    column without an explicit spec.
    """
    actions = dict(specs)
    if choice:
        for c in df.columns:
            if c not in actions and _is_choice_struct(df, c):
                actions[c] = choice
    out = df
    for col, action in actions.items():
        out = _apply_action(out, col, action, catalog_schema)
    return out


def _apply_action(
    df: DataFrame, col: str, action: str, catalog_schema: T.StructType | None
) -> DataFrame:
    dt = df.schema[col].dataType
    if action in ("make_struct", "KeepAsStruct"):
        return df
    if action.startswith("cast:"):
        target = action.split(":", 1)[1]
        if isinstance(dt, T.StructType):
            casts = [F.col(f"{col}.{f.name}").try_cast(target) for f in dt.fields]
            return df.withColumn(col, F.coalesce(*casts))
        return df.withColumn(col, F.col(col).try_cast(target))
    if action.startswith("project:"):
        target = action.split(":", 1)[1]
        if not isinstance(dt, T.StructType):
            return df.withColumn(col, F.col(col).try_cast(target))
        names = [f.name for f in dt.fields]
        if target not in names:
            raise ValueError(
                f"project:{target}: column {col!r} has variants {names}"
            )
        return df.withColumn(col, F.col(f"{col}.{target}"))
    if action in ("match_catalog", "MATCH_CATALOG"):
        if catalog_schema is None:
            raise ValueError("match_catalog requires catalog_schema")
        target_dt = catalog_schema[col].dataType
        if isinstance(dt, T.StructType):
            casts = [F.col(f"{col}.{f.name}").try_cast(target_dt) for f in dt.fields]
            return df.withColumn(col, F.coalesce(*casts))
        return df.withColumn(col, F.col(col).try_cast(target_dt))
    raise ValueError(f"unknown resolveChoice action {action!r}")
