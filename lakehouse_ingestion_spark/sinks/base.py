"""Writer abstraction + registry.

Parity with reference writer dispatch (``core/IngestionRunner.scala:
98-116``: parquet/s3-parquet | iceberg | delta/deltalake) and the write
surface of ``io/S3ParquetWriter.scala`` / ``lakehouse/DeltaLakeWriter
.scala`` / ``lakehouse/IcebergAppendWriter.scala``: batch append/
overwrite, streaming append with checkpoint + processing-time trigger,
optional partition columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame

from lakehouse_ingestion_spark.errors import UnsupportedFeatureError

_WRITERS: dict[str, type] = {}


def register_writer(name: str):
    def deco(cls):
        _WRITERS[name.lower()] = cls
        for alias in getattr(cls, "aliases", []):
            _WRITERS[alias.lower()] = cls
        return cls

    return deco


def get_writer(fmt: str) -> "BaseWriter":
    cls = _WRITERS.get(fmt.lower())
    if cls is None:
        raise UnsupportedFeatureError(f"no writer for format '{fmt}'; known: {sorted(_WRITERS)}")
    return cls()


@dataclass
class WriteOptions:
    path: Optional[str] = None
    table: Optional[str] = None
    mode: str = "append"  # append | overwrite (reference default: append)
    partition_by: list[str] = field(default_factory=list)
    checkpoint_location: Optional[str] = None
    trigger_interval: str = "30 seconds"  # reference default, DeltaLakeWriter.scala:62
    output_mode: str = "append"
    options: dict = field(default_factory=dict)

    @property
    def target(self) -> str:
        t = self.path or self.table
        if not t:
            raise ValueError("write requires 'path' or 'table'")
        return t


class BaseWriter:
    aliases: list[str] = []

    def write_batch(self, df: DataFrame, opts: WriteOptions) -> None:
        raise NotImplementedError

    def write_streaming(self, df: DataFrame, opts: WriteOptions):
        """Start a streaming query and RETURN it (the reference blocks on
        awaitTermination inside the writer — ``DeltaLakeWriter.scala:89`` —
        which serializes multi-job configs; the stream manager owns
        termination here, SURVEY.md §3.2)."""
        raise NotImplementedError

    def write(self, df: DataFrame, opts: WriteOptions):
        if df.isStreaming:
            return self.write_streaming(df, opts)
        return self.write_batch(df, opts)
