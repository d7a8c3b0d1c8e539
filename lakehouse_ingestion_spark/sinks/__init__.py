from lakehouse_ingestion_spark.sinks.base import BaseWriter, get_writer  # noqa: F401
from lakehouse_ingestion_spark.sinks.parquet import ParquetWriter  # noqa: F401
from lakehouse_ingestion_spark.sinks.delta import DeltaWriter, DELTA_AVAILABLE  # noqa: F401
from lakehouse_ingestion_spark.sinks.iceberg import IcebergWriter, iceberg_available  # noqa: F401
from lakehouse_ingestion_spark.sinks.fanout import FanoutWriter  # noqa: F401
from lakehouse_ingestion_spark.sinks.curation import StickySplitWriter  # noqa: F401
from lakehouse_ingestion_spark.sinks.ann_index import AnnIndexWriter  # noqa: F401
from lakehouse_ingestion_spark.sinks.export import ShardExportWriter  # noqa: F401
from lakehouse_ingestion_spark.sinks.budget import BudgetAdmitWriter  # noqa: F401
from lakehouse_ingestion_spark.sinks.contamination import ContaminationAuditWriter  # noqa: F401
