from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.registry import (
    read_source,
    read_tsv,
    write_sink,
)
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.catalog import WarehouseCatalog
from aws_glue_redshift_datawarehouse_etl_pipeline_spark.sources.txlog import (
    TransactionalCatalog,
    TxTable,
)

__all__ = [
    "read_source",
    "read_tsv",
    "write_sink",
    "WarehouseCatalog",
    "TransactionalCatalog",
    "TxTable",
]
