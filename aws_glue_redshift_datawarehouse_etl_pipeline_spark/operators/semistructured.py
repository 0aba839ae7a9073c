"""Semi-structured / nested-schema operators — the reference library's
specialty (SURVEY.md §2.6), rebuilt as plan composers over the
DataFrame API: flattening is a Project, array pivoting is posexplode +
key propagation, unboxing is from_json/from_csv. No staging directories
are needed (the reference stages relationalize pivots to S3 CSV,
/root/reference/awsglue/transforms/relationalize.py:42-46 — here each
child table is just another lazy DataFrame).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _flat_cols(schema: T.StructType, prefix: str = "") -> list[tuple[str, str]]:
    """(source_path, flattened_name) pairs for all leaf/array fields,
    recursing into structs. Flattened names use dotted paths, matching
    the reference's unnest naming (awsglue/dynamicframe.py:310-322)."""
    out: list[tuple[str, str]] = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(_flat_cols(f.dataType, prefix=f"{path}."))
        else:
            out.append((path, path))
    return out


def unnest(df: DataFrame) -> DataFrame:
    """Flatten nested structs to top-level dotted-name columns
    (UnnestFrame, /root/reference/awsglue/transforms/unnest_frame.py:15-75).
    Arrays stay in place — relationalize pivots them. One Project, so
    Catalyst still prunes unused leaves from the scan."""
    cols = [F.col(p).alias(n) for p, n in _flat_cols(df.schema)]
    return df.select(*cols)


def relationalize(
    df: DataFrame,
    root_table_name: str = "root",
    id_cols: Sequence[str] | None = None,
) -> dict[str, DataFrame]:
    """Unnest structs and pivot every array column into a child table
    keyed back to the root (Relationalize,
    /root/reference/awsglue/transforms/relationalize.py:16-105).

    ``id_cols``: natural-key columns used as the join key to child
    tables. When absent, a synthetic ``__rid`` is generated with
    ``monotonically_increasing_id()`` (stable within a job, like the
    reference's generated joinkeys). Child tables are named
    ``<root>_<column>`` with (key, index, value) rows via posexplode —
    exactly one shuffle-free narrow stage per array column.
    """
    flat = unnest(df)
    if id_cols is None:
        flat = flat.withColumn("__rid", F.monotonically_increasing_id())
        id_cols = ["__rid"]
    flat = flat.cache() if id_cols == ["__rid"] else flat
    array_cols = [f.name for f in flat.schema.fields if isinstance(f.dataType, T.ArrayType)]
    out: dict[str, DataFrame] = {}
    root = flat
    for name in array_cols:
        child = flat.select(
            *[F.col(f"`{k}`") for k in id_cols],
            F.posexplode_outer(F.col(f"`{name}`")).alias("index", "val"),
        )
        out[f"{root_table_name}_{name}"] = child
        root = root.drop(name)
    out[root_table_name] = root
    return out


def unbox(
    df: DataFrame,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
    **options: str,
) -> DataFrame:
    """Parse a string (or, for avro, binary) column as embedded
    JSON/CSV/Avro into a struct column of the same name (Unbox,
    /root/reference/awsglue/transforms/unbox.py:15-112 — same format
    list). A schema keeps the parse a single vectorized expression;
    without one, a sampling inference pass derives it (schema_of_json
    on a driver-side sample — cheap, but prefer explicit schemas at
    scale). Avro requires an explicit Avro JSON schema string and the
    spark-avro connector on the session classpath (it is an external
    Spark module; ``from_avro`` raises AVRO_NOT_LOADED otherwise)."""
    fmt = fmt.lower()
    if fmt == "json":
        if schema is None:
            sample = [r[0] for r in df.select(path).dropna().limit(100).collect()]
            if not sample:
                raise ValueError(f"cannot infer JSON schema: column {path} is all-null")
            schema = spark_schema_of_json_samples(df, path, sample)
        parsed: Column = F.from_json(F.col(path), schema, dict(options))
    elif fmt == "csv":
        if schema is None:
            raise ValueError("CSV unbox requires an explicit schema")
        sep = options.pop("separator", ",")
        parsed = F.from_csv(F.col(path), schema if isinstance(schema, str) else schema.simpleString(), {"sep": sep, **options})
    elif fmt == "avro":
        if schema is None or not isinstance(schema, str):
            raise ValueError(
                "Avro unbox requires an explicit Avro JSON schema string "
                "(there is no in-band schema in a bare Avro-encoded column)"
            )
        return _unbox_avro(df, path, schema, dict(options))
    else:
        raise ValueError(f"unsupported unbox format: {fmt!r}")
    return df.withColumn(path, parsed)


def _unbox_avro(df: DataFrame, path: str, schema: str, options: dict) -> DataFrame:
    """Avro unbox: JVM ``from_avro`` (vectorized, codegen'd) when the
    external spark-avro module is on the classpath, else the pure-Python
    Arrow-batched fallback codec (operators/avro_codec.py). The JVM
    probe is plan-time (AVRO_NOT_LOADED surfaces at expression
    resolution), so the fallback decision costs no job."""
    from pyspark.sql.avro.functions import from_avro
    from pyspark.sql.utils import AnalysisException

    try:
        out = df.withColumn(path, from_avro(F.col(path), schema, options))
        out.schema  # force resolution: raises AVRO_NOT_LOADED without the jar
        return out
    except AnalysisException as exc:
        if "AVRO" not in str(exc).upper():
            raise
        from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.avro_codec import (
            unbox_avro_python,
        )

        return unbox_avro_python(df, path, schema)


def spark_schema_of_json_samples(df: DataFrame, path: str, sample: list[str]) -> T.StructType:
    """Infer a union schema across sampled JSON strings by letting the
    JSON reader merge them (mirrors the reference's choice-merging
    ingest inference at small cost)."""
    spark = df.sparkSession
    rdd = spark.sparkContext.parallelize(sample, 1)
    return spark.read.json(rdd).schema


def _null_paths(schema: T.StructType, prefix: str = "") -> list[str]:
    """Dotted paths of NullType fields, descending structs and
    arrays-of-structs (the reference skips maps — drop_nulls.py:24-34)."""
    out = []
    for f in schema.fields:
        path = f"{prefix}{f.name}"
        dt = f.dataType
        if isinstance(dt, T.NullType):
            out.append(path)
        elif isinstance(dt, T.StructType):
            out.extend(_null_paths(dt, prefix=f"{path}."))
        elif isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
            out.extend(
                f"{path}.{sub}" for sub in _null_paths(dt.elementType)
            )
    return out


def drop_null_fields(df: DataFrame) -> DataFrame:
    """Drop all NullType fields (DropNullFields,
    /root/reference/awsglue/transforms/drop_nulls.py:17-42)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.field_ops import drop_fields

    paths = _null_paths(df.schema)
    return drop_fields(df, paths) if paths else df


_DDB_TAGS = {"S", "N", "B", "BOOL", "NULL", "M", "L", "SS", "NS", "BS"}


def unnest_ddb_json(df: DataFrame) -> DataFrame:
    """Strip DynamoDB-JSON type annotations: a struct column whose only
    field is a type tag ({"S": x} / {"N": x} / ...) collapses to the
    tagged value (/root/reference/awsglue/dynamicframe.py:390-392).
    One-level implementation over the declared schema."""
    cols: list[Column] = []
    for f in df.schema.fields:
        dt = f.dataType
        if (
            isinstance(dt, T.StructType)
            and len(dt.fields) == 1
            and dt.fields[0].name in _DDB_TAGS
        ):
            tag = dt.fields[0].name
            inner = F.col(f"{f.name}.{tag}")
            if tag == "N":
                inner = inner.cast("double")
            cols.append(inner.alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


def unbox_with_errors(
    df: DataFrame,
    path: str,
    fmt: str,
    schema: T.StructType | str | None = None,
    **options: str,
):
    """``unbox`` with the reference's error-record side channel
    (DynamicFrame error semantics, awsglue/dynamicframe.py:187-201)
    extended to parse failures: rows whose source column is non-null
    but fails to parse become (stage, error_message, record) rows on
    the errors frame instead of silently carrying a null struct. NULL
    sources pass through as NULL structs — absent data is not an
    error. Returns an ``EngineFrame`` so thresholds
    (``assert_error_threshold``) and ``errors_frame`` compose.

    Both outputs are projections of ONE parsed plan (the parse
    expression is not evaluated twice per row within a job thanks to
    common-subexpression reuse; across the two frames' separate
    actions the scan re-runs — persist upstream when both sides are
    consumed and the source is expensive)."""
    from aws_glue_redshift_datawarehouse_etl_pipeline_spark.frame import (
        ERROR_SCHEMA,
        EngineFrame,
    )

    fmt = fmt.lower()
    if fmt not in ("json", "csv"):
        raise ValueError(
            "unbox_with_errors supports json and csv (from_json/from_csv "
            "PERMISSIVE corrupt-record capture); avro's binary decoder "
            "raises on malformed input instead of nulling"
        )
    if schema is None:
        raise ValueError("unbox_with_errors requires an explicit schema")
    # the parser's own corrupt-record capture: PERMISSIVE mode routes
    # every malformed value's raw text into this extra struct field
    # (an all-null struct is NOT a reliable failure signal — a valid
    # record of nulls looks identical)
    corrupt = "_corrupt_record"
    clash = {"mode", "columnNameOfCorruptRecord"} & set(options)
    if clash:
        raise ValueError(
            f"unbox_with_errors owns {sorted(clash)} (it requires PERMISSIVE "
            "corrupt-record capture); use plain unbox for FAILFAST/DROPMALFORMED"
        )
    declared = (
        [f.name for f in schema.fields]
        if isinstance(schema, T.StructType)
        else [p.strip().split()[0] for p in schema.split(",") if p.strip()]
    )
    if corrupt in declared:
        raise ValueError(
            f"schema already declares {corrupt!r}; rename that field — it is "
            "reserved for the failure channel here"
        )
    if isinstance(schema, str):
        schema2: T.StructType | str = f"{schema}, {corrupt} STRING"
    else:
        schema2 = T.StructType(
            list(schema.fields) + [T.StructField(corrupt, T.StringType(), True)]
        )
    opts = {**options, "mode": "PERMISSIVE", "columnNameOfCorruptRecord": corrupt}
    parsed = unbox(df, path, fmt, schema=schema2, **opts)
    failed = F.col(f"{path}.{corrupt}").isNotNull()
    data = parsed.filter(~failed).withColumn(path, F.col(path).dropFields(corrupt))
    errors = parsed.filter(failed).select(
        F.lit(f"unbox_{fmt}").alias("stage"),
        F.lit("malformed record").alias("error_message"),
        F.col(f"{path}.{corrupt}").alias("record"),
    )
    return EngineFrame(
        data,
        errors.select([F.col(f.name) for f in ERROR_SCHEMA.fields]),
        name=f"unbox_{fmt}",
    )
