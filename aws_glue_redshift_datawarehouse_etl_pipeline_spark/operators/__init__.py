"""Relational + semi-structured operator surface of the engine.

Each operator is a pure ``DataFrame -> DataFrame`` (or ``-> dict[str,
DataFrame]``) function. The operators mirror the semantics of the
reference's DynamicFrame transform set (see SURVEY.md §2), expressed on
the public PySpark API so Catalyst plans, prunes, and reorders them.
"""

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.field_ops import (
    apply_mapping,
    drop_fields,
    rename_field,
    select_fields,
    split_fields,
    split_rows,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.joins import (
    equi_join,
    incremental_new_rows,
    left_anti_via_left_join,
    merge_upsert,
    merge_upsert_into_path,
    snapshot_diff,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.operators.setops import (
    union_by_name,
)

__all__ = [
    "apply_mapping",
    "drop_fields",
    "rename_field",
    "select_fields",
    "split_fields",
    "split_rows",
    "equi_join",
    "incremental_new_rows",
    "left_anti_via_left_join",
    "merge_upsert",
    "merge_upsert_into_path",
    "snapshot_diff",
    "union_by_name",
]
