"""Kinesis source (SURVEY.md D3 — declared-only in the reference:
"planned" at ``docs/00-architecture-overview.md:380``; no implementation
exists there either).

Spark has no first-party Kinesis connector; deployments use a vendor
connector (e.g. the ``aws-kinesis`` data source on EMR/Glue, or the
spark-sql-kinesis package). This reader validates options and dispatches
to whichever connector format is on the classpath, so the config surface
is stable even though the connector is environment-provided.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from lakehouse_ingestion_spark.errors import ConfigError, UnsupportedFeatureError
from lakehouse_ingestion_spark.sources.base import BaseReader, register_reader

# candidate connector format names, probed in order
_CONNECTOR_FORMATS = ("aws-kinesis", "kinesis")

REQUIRED = ("streamName", "region")


def _kinesis_format(spark: SparkSession) -> str | None:
    # lookupDataSource requires a SQLConf (a SparkConf raises on every
    # call, which would report the connector missing even when installed)
    jvm = spark._jvm
    for fmt in _CONNECTOR_FORMATS:
        try:
            jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
                fmt, jvm.org.apache.spark.sql.internal.SQLConf.get()
            )
            return fmt
        except Exception:
            continue
    return None


@register_reader("kinesis")
class KinesisReader(BaseReader):
    def read(
        self,
        spark: SparkSession,
        options: dict,
        schema: Optional[StructType] = None,
    ) -> DataFrame:
        opts = dict(options)
        missing = [k for k in REQUIRED if k not in opts]
        if missing:
            raise ConfigError(f"kinesis source requires options: {missing}")
        fmt = _kinesis_format(spark)
        if fmt is None:
            raise UnsupportedFeatureError(
                "no Kinesis connector on the classpath (expected one of "
                f"{_CONNECTOR_FORMATS}); install a vendor connector such as "
                "spark-sql-kinesis or run on a platform that provides one"
            )
        streaming = str(opts.pop("streaming", "true")).lower() == "true"
        reader = (spark.readStream if streaming else spark.read).format(fmt)
        for k, v in opts.items():
            reader = reader.option(k, v)
        df = reader.load()
        if schema is not None:
            from lakehouse_ingestion_spark.sources.kafka import decode_json_value

            df = decode_json_value(df.selectExpr("CAST(data AS STRING) AS value"), schema)
        return df
