"""PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
AWS-Glue-to-Redshift warehouse pipeline surveyed in SURVEY.md, built
idiomatically on the public Spark DataFrame / SQL / Structured Streaming
APIs. Catalyst/Tungsten do the optimizing; the engine contributes the
semantics layer: schema-on-read union ("choice") typing, a
DynamicFrame-style operator surface with an error-record side channel,
star-schema incremental loading, micro-batch streaming, and large-scale
training-data operators (dedup, similarity search, text analysis,
multimodal columns).
"""

from aws_glue_redshift_datawarehouse_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]

__version__ = "0.1.0"
