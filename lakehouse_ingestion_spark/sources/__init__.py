from lakehouse_ingestion_spark.sources.base import BaseReader, get_reader  # noqa: F401
from lakehouse_ingestion_spark.sources.files import FileReader  # noqa: F401
from lakehouse_ingestion_spark.sources.kafka import KafkaReader  # noqa: F401
from lakehouse_ingestion_spark.sources.jdbc import JdbcReader  # noqa: F401
from lakehouse_ingestion_spark.sources.kinesis import KinesisReader  # noqa: F401
