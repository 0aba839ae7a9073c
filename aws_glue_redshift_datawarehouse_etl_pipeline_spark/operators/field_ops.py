"""Projection / column operators.

Semantics modeled on the reference's field transforms
(/root/reference/awsglue/transforms/field_transforms.py:15-382 and
/root/reference/awsglue/transforms/apply_mapping.py:15-72), re-expressed
as Catalyst ``Project`` nodes: every operator here compiles to a single
``select`` so column pruning reaches the parquet scan.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mapping tuples are (src, srcType, dst, dstType) | (src, dst, dstType) |
# (src, dst) — the reference accepts lengths 2/3/4
# (/root/reference/awsglue/dynamicframe.py:367-375). srcType is advisory
# (the actual type comes from the frame); dstType drives the cast.
MappingTuple = Sequence[str]


def _normalize_mapping(m: MappingTuple) -> tuple[str, str | None, str, str | None]:
    if len(m) == 4:
        src, src_t, dst, dst_t = m
    elif len(m) == 3:
        src, dst, dst_t = m
        src_t = None
    elif len(m) == 2:
        src, dst = m
        src_t = dst_t = None
    else:
        raise ValueError(f"mapping tuple must have 2-4 elements, got {m!r}")
    return src, src_t, dst, dst_t


def apply_mapping(df: DataFrame, mappings: Iterable[MappingTuple]) -> DataFrame:
    """Combined project + rename + cast from a declarative tuple list.

    The workhorse of the reference pipeline (ApplyMapping,
    /root/reference/awsglue/transforms/apply_mapping.py:15-72): one
    Catalyst Project, so unreferenced columns never leave the scan.
    Nested source paths ("a.b") are allowed; dst is always top-level.
    """
    cols: list[Column] = []
    for m in mappings:
        src, _src_t, dst, dst_t = _normalize_mapping(m)
        c = F.col(src)
        if dst_t is not None:
            c = c.cast(dst_t)
        cols.append(c.alias(dst))
    return df.select(*cols)


def select_fields(df: DataFrame, paths: Sequence[str]) -> DataFrame:
    """Keep only the listed (possibly nested) fields.

    Mirrors SelectFields
    (/root/reference/awsglue/transforms/field_transforms.py:151-213).
    Nested paths are aliased with their dotted name, matching the
    reference's flattened naming of selected nested fields.
    """
    cols = [F.col(p).alias(p) if "." in p else F.col(p) for p in paths]
    return df.select(*cols)


def _drop_nested(df: DataFrame, path: str) -> DataFrame:
    parent, _, leaf = path.rpartition(".")
    return df.withColumn(parent.split(".")[0], F.col(parent).dropFields(leaf))


def drop_fields(df: DataFrame, paths: Sequence[str]) -> DataFrame:
    """Drop the listed fields; nested paths rebuild the parent struct
    via ``Column.dropFields`` (DropFields,
    /root/reference/awsglue/transforms/field_transforms.py:86-148)."""
    top = [p for p in paths if "." not in p]
    out = df.drop(*top) if top else df
    for p in paths:
        if "." in p:
            out = _drop_nested(out, p)
    return out


def rename_field(df: DataFrame, old: str, new: str) -> DataFrame:
    """Rename one field (RenameField,
    /root/reference/awsglue/transforms/field_transforms.py:15-83)."""
    if "." in old:
        parent, _, leaf = old.rpartition(".")
        root = parent.split(".")[0]
        return df.withColumn(
            root, F.col(parent).withField(new, F.col(old)).dropFields(leaf)
        )
    return df.withColumnRenamed(old, new)


def rename_fields(df: DataFrame, renames: Mapping[str, str]) -> DataFrame:
    """Bulk rename — the reference's per-column loop
    (/root/reference/pipeline.py:89-91) collapsed into one Project."""
    return df.withColumnsRenamed(dict(renames))


def positional_rename(df: DataFrame, names: Sequence[str]) -> DataFrame:
    """Assign names by column position — the reference's headerless-CSV
    idiom (/root/reference/pipeline.py:89-91). Extra source columns are
    kept under their original names; fewer is an error."""
    existing = df.columns
    if len(names) > len(existing):
        raise ValueError(
            f"{len(names)} names for {len(existing)} columns: {names!r}"
        )
    return df.withColumnsRenamed(dict(zip(existing, names)))


def split_fields(
    df: DataFrame, paths: Sequence[str], name1: str = "selected", name2: str = "rest"
) -> dict[str, DataFrame]:
    """Project into two complementary frames (SplitFields,
    /root/reference/awsglue/transforms/field_transforms.py:216-299)."""
    return {name1: select_fields(df, paths), name2: drop_fields(df, paths)}


_COMPARATORS = {
    ">": lambda c, v: c > v,
    "<": lambda c, v: c < v,
    ">=": lambda c, v: c >= v,
    "<=": lambda c, v: c <= v,
    "==": lambda c, v: c == v,
    "=": lambda c, v: c == v,
    "!=": lambda c, v: c != v,
}


def comparison_predicate(comparison_dict: Mapping[str, Mapping[str, Any]]) -> Column:
    """Build a conjunctive Column predicate from the reference's
    comparator-dict spec ``{"path": {">": 10, "<": 20}}`` (SplitRows,
    /root/reference/awsglue/transforms/field_transforms.py:301-382)."""
    pred: Column | None = None
    for path, ops in comparison_dict.items():
        for op, val in ops.items():
            try:
                clause = _COMPARATORS[op](F.col(path), val)
            except KeyError:
                raise ValueError(f"unknown comparator {op!r} for {path!r}") from None
            pred = clause if pred is None else pred & clause
    if pred is None:
        raise ValueError("empty comparison dict")
    return pred


def split_rows(
    df: DataFrame,
    comparison_dict: Mapping[str, Mapping[str, Any]],
    name1: str = "matched",
    name2: str = "unmatched",
) -> dict[str, DataFrame]:
    """Partition rows by a comparator spec into (matching, rest).

    NULLs in compared columns land in neither SQL predicate, so the
    "unmatched" side uses the null-safe complement to keep the two
    frames a true partition of the input.
    """
    pred = comparison_predicate(comparison_dict)
    return {
        name1: df.filter(pred),
        name2: df.filter(~F.coalesce(pred, F.lit(False))),
    }


def add_ingestion_time_columns(df: DataFrame, granularity: str = "day") -> DataFrame:
    """Append ingest_year/month/day/hour/minute from the batch clock
    (/root/reference/awsglue/context.py:666-674)."""
    levels = ["year", "month", "day", "hour", "minute"]
    if granularity not in levels:
        raise ValueError(f"granularity must be one of {levels}")
    now = F.current_timestamp()
    fns = {
        "year": F.year,
        "month": F.month,
        "day": F.dayofmonth,
        "hour": F.hour,
        "minute": F.minute,
    }
    for level in levels[: levels.index(granularity) + 1]:
        df = df.withColumn(f"ingest_{level}", fns[level](now))
    return df
