"""File sources: CSV / JSON / Parquet / ORC / Avro / text / binaryFile,
batch or streaming (SURVEY.md D1). binaryFile is the raw-media ingest
entry for the multimodal pipeline (`functions/multimodal.py`): fixed
(path, modificationTime, length, content) schema, bytes untouched.

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
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from lakehouse_ingestion_spark.errors import ConfigError, UnsupportedFeatureError
from lakehouse_ingestion_spark.sources.base import BaseReader, register_reader

_FORMATS = {"csv", "json", "parquet", "avro", "text", "orc", "binaryfile"}

# Spark's DataSource name is camelCase; config accepts any case
_FORMAT_NAMES = {"binaryfile": "binaryFile"}

# binaryFile's fixed output schema (BinaryFileFormat.schema); built
# field-by-field — fromDDL needs an active session at import time
_BINARYFILE_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("modificationTime", TimestampType()),
        StructField("length", LongType()),
        StructField("content", BinaryType()),
    ]
)


@register_reader("file")
class FileReader(BaseReader):
    aliases = [
        "csv", "json", "parquet", "avro", "text", "orc", "binaryfile",
        "files",
    ]

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

        if fmt == "binaryfile" and schema is not None:
            # binaryFile's schema is fixed (path, modificationTime,
            # length, content) — Spark rejects user schemas; fail with
            # the config-layer error, not a Spark stack trace
            raise ConfigError(
                "binaryFile has a fixed schema; drop the schema ref and"
                " decode the content column downstream"
                " (functions/multimodal.py)"
            )
        reader = spark.readStream if streaming else spark.read
        reader = reader.format(_FORMAT_NAMES.get(fmt, fmt))
        if schema is not None:
            reader = reader.schema(schema)
        elif streaming and fmt == "binaryfile":
            # the streaming file source insists on an explicit schema
            # even for fixed-schema formats — supply binaryFile's own
            reader = reader.schema(_BINARYFILE_SCHEMA)
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
