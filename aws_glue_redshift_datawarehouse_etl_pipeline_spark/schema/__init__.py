from aws_glue_redshift_datawarehouse_etl_pipeline_spark.schema.choice import (
    ChoiceType,
    EnumType,
    merge_data_types,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.schema.resolve import (
    encode_choice_column,
    resolve_choice,
)

__all__ = [
    "ChoiceType",
    "EnumType",
    "merge_data_types",
    "encode_choice_column",
    "resolve_choice",
]
