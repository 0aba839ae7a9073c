"""Warehouse DDL → StructType, for catalog-schema validation.

Parses the subset of CREATE TABLE grammar the reference's warehouse DDL
uses (/root/reference/redshift/ddl.sql:1-93): column lists with
INTEGER/VARCHAR/TIMESTAMP/REAL/etc., PRIMARY KEY / NOT NULL / SORTKEY /
ENCODE clauses (recorded, not enforced — sort keys drive the writer's
repartitionByRange + sortWithinPartitions layout).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

_TYPE_MAP = {
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "int4": T.IntegerType(),
    "bigint": T.LongType(),
    "int8": T.LongType(),
    "smallint": T.ShortType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double": T.DoubleType(),
    "float8": T.DoubleType(),
    "float": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "date": T.DateType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "text": T.StringType(),
}


@dataclass
class TableDDL:
    name: str
    schema: T.StructType
    primary_key: list[str] = field(default_factory=list)
    sort_keys: list[str] = field(default_factory=list)


def _parse_type(raw: str) -> T.DataType:
    s = raw.strip().lower()
    m = re.match(r"(varchar|character varying|char|nvarchar)\s*(\(\s*\d+\s*\))?", s)
    if m:
        return T.StringType()
    m = re.match(r"(decimal|numeric)\s*\(\s*(\d+)\s*,\s*(\d+)\s*\)", s)
    if m:
        return T.DecimalType(int(m.group(2)), int(m.group(3)))
    base = re.split(r"[\s(]", s, 1)[0]
    if base in _TYPE_MAP:
        return _TYPE_MAP[base]
    raise ValueError(f"unsupported DDL type: {raw!r}")


def parse_ddl(sql: str) -> dict[str, TableDDL]:
    """Parse every CREATE TABLE statement in a DDL script."""
    out: dict[str, TableDDL] = {}
    for m in re.finditer(
        r"create\s+table\s+(?:if\s+not\s+exists\s+)?\"?([\w.]+)\"?\s*\((.*?)\)\s*"
        r"((?:sortkey\s*\(([^)]*)\))?\s*(?:encode\s+\w+)?\s*);",
        sql,
        flags=re.IGNORECASE | re.DOTALL,
    ):
        name = m.group(1).split(".")[-1]
        body = m.group(2)
        tail_sort = m.group(4)
        fields: list[T.StructField] = []
        pk: list[str] = []
        sort_keys: list[str] = []
        if tail_sort:
            sort_keys = [c.strip().strip('"') for c in tail_sort.split(",")]
        depth = 0
        col_defs, cur = [], []
        for ch in body:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                col_defs.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if cur:
            col_defs.append("".join(cur))
        for cd in col_defs:
            cd = cd.strip()
            if not cd:
                continue
            low = cd.lower()
            if low.startswith("primary key"):
                cols = re.search(r"\(([^)]*)\)", cd)
                if cols:
                    pk = [c.strip().strip('"') for c in cols.group(1).split(",")]
                continue
            if low.startswith(("foreign key", "constraint", "unique", "sortkey")):
                continue
            cm = re.match(r'"?([\w]+)"?\s+(.+)', cd)
            if not cm:
                continue
            col_name, rest = cm.group(1), cm.group(2)
            rest_low = rest.lower()
            not_null = "not null" in rest_low
            if "primary key" in rest_low:
                pk.append(col_name)
            if "sortkey" in rest_low:
                sort_keys.append(col_name)
            type_str = re.split(
                r"\s+(?:primary|not|null|default|encode|references|sortkey|unique)",
                rest,
                1,
                flags=re.IGNORECASE,
            )[0]
            fields.append(
                T.StructField(col_name, _parse_type(type_str), not not_null)
            )
        out[name] = TableDDL(name, T.StructType(fields), pk, sort_keys)
    return out
