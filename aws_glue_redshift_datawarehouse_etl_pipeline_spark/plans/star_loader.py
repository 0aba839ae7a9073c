"""Star-schema incremental loader — the reference pipeline's 6-dim +
fact template (/root/reference/pipeline.py:84-151 repeated per
dimension, fact at :798-1013) as one data-driven function pair instead
of six copies.

Per load: apply declarative mappings (project+rename+cast), anti-join
against the warehouse on the business key to keep only new rows, append
with SORTKEY layout. The reference's count-gated branching
(pipeline.py:119-151) is preserved: an absent/empty target skips the
anti-join entirely (no join, no shuffle on first load). Loading the
same batch twice inserts zero rows — the idempotence invariant the
whole design exists for.

Scale notes: the anti-join shuffles on the business key only after
projecting the existing side down to its key columns (a fraction of the
table); when the existing key set is small enough it broadcasts. The
fact build joins its two inputs once, then one anti-join on the
composite key — two shuffles total at any scale.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

from pyspark.sql import DataFrame

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.field_ops import apply_mapping
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.joins import (
    equi_join,
    incremental_new_rows,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import WarehouseCatalog


@dataclass
class DimensionSpec:
    table: str
    mappings: Sequence[tuple]  # apply_mapping tuples
    keys: Sequence[str]  # business key for anti-join dedup
    sort_keys: Sequence[str] = field(default_factory=list)


@dataclass
class FactSpec:
    table: str
    left_keys: Sequence[str]
    right_keys: Sequence[str]
    mappings: Sequence[tuple]
    anti_keys: Sequence[str]  # composite dedup key (pipeline.py:975-989)
    sort_keys: Sequence[str] = field(default_factory=list)
    broadcast_right: bool = False


@dataclass
class LoadResult:
    table: str
    incoming: int
    inserted: int


def load_dimension(
    source: DataFrame, spec: DimensionSpec, catalog: WarehouseCatalog
) -> LoadResult:
    incoming = apply_mapping(source, spec.mappings)
    if catalog.table_exists(spec.table):
        existing = catalog.read_table(spec.table)
        new_rows = incremental_new_rows(incoming, existing, list(spec.keys))
    else:
        new_rows = incoming
    # One pass over the lineage: cache before the two actions
    # (insert-count gate + write), mirroring-but-fixing the reference's
    # triple count() on uncached lineage (pipeline.py:119-130).
    new_rows = new_rows.cache()
    n_new = new_rows.count()
    if n_new > 0:
        catalog.write_table(new_rows, spec.table, sort_keys=spec.sort_keys)
    n_in = incoming.count()
    new_rows.unpersist()
    return LoadResult(spec.table, n_in, n_new)


def load_fact(
    left: DataFrame,
    right: DataFrame,
    spec: FactSpec,
    catalog: WarehouseCatalog,
) -> LoadResult:
    joined = equi_join(
        left,
        right,
        list(spec.left_keys),
        list(spec.right_keys),
        how="inner",
        broadcast_right=spec.broadcast_right,
    )
    incoming = apply_mapping(joined, spec.mappings)
    if catalog.table_exists(spec.table):
        existing = catalog.read_table(spec.table)
        new_rows = incremental_new_rows(incoming, existing, list(spec.anti_keys))
    else:
        new_rows = incoming
    new_rows = new_rows.cache()
    n_new = new_rows.count()
    if n_new > 0:
        catalog.write_table(new_rows, spec.table, sort_keys=spec.sort_keys)
    new_rows.unpersist()
    return LoadResult(spec.table, -1, n_new)
