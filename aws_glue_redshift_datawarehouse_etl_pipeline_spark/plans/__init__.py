from aws_glue_redshift_datawarehouse_etl_pipeline_spark.plans.star_loader import (
    DimensionSpec,
    FactSpec,
    LoadResult,
    load_dimension,
    load_fact,
)

__all__ = ["DimensionSpec", "FactSpec", "LoadResult", "load_dimension", "load_fact"]
