"""File sources: CSV / JSON / Parquet / Avro / text, batch or streaming
(SURVEY.md D1).

Explicit schema is the default posture (reference policy: avoid schema
inference — ``docs/02-tech-spec.md:92-98``); inference only when the
caller passes no schema AND sets ``infer=true``.

Streaming: the same formats serve as micro-batch streaming sources
(``spark.readStream`` file source with ``maxFilesPerTrigger``), which is
also the broker-free test substitute for Kafka.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from lakehouse_ingestion_spark.errors import ConfigError, UnsupportedFeatureError
from lakehouse_ingestion_spark.sources.base import BaseReader, register_reader

_FORMATS = {"csv", "json", "parquet", "avro", "text", "orc"}


@register_reader("file")
class FileReader(BaseReader):
    aliases = ["csv", "json", "parquet", "avro", "text", "orc", "files"]

    def read(
        self,
        spark: SparkSession,
        options: dict,
        schema: Optional[StructType] = None,
    ) -> DataFrame:
        opts = dict(options)
        path = opts.pop("path", None)
        if not path:
            raise ConfigError("file source requires 'path'")
        fmt = (opts.pop("format", None) or _infer_format(path)).lower()
        if fmt not in _FORMATS:
            raise UnsupportedFeatureError(f"unsupported file format: {fmt}")
        if fmt == "avro" and not _avro_available(spark):
            raise UnsupportedFeatureError(
                "avro requires the external spark-avro package "
                "(org.apache.spark:spark-avro_2.13) on the classpath; "
                "it is not bundled in this environment"
            )
        streaming = str(opts.pop("streaming", "false")).lower() == "true"
        infer = str(opts.pop("infer", "false")).lower() == "true"

        reader = spark.readStream if streaming else spark.read
        reader = reader.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        elif streaming:
            raise ConfigError("streaming file source requires an explicit schema")
        elif fmt in ("csv", "json") and infer:
            reader = reader.option("inferSchema", "true")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load(path)


def _avro_available(spark: SparkSession) -> bool:
    """Probe the same data-source lookup Spark's reader performs (some
    avro library jars ship without the spark-avro data source, so a bare
    class-presence check false-positives). lookupDataSource takes a
    SQLConf — passing SparkConf throws on every call and would make the
    probe permanently False even with spark-avro installed."""
    try:
        jvm = spark._jvm
        jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(
            "avro", jvm.org.apache.spark.sql.internal.SQLConf.get()
        )
        return True
    except Exception:
        return False


def _infer_format(path: str) -> str:
    for fmt in _FORMATS:
        if path.rstrip("/").endswith(f".{fmt}"):
            return fmt
    return "parquet"
