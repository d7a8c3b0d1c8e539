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

from lakehouse_ingestion_spark.errors import ConfigError, UnsupportedFeatureError

_WRITERS: dict[str, type] = {}

# target.options keys the pipeline itself consumes when building
# WriteOptions (pipeline.py _write_options pops them before the writer
# ever sees the dict) — always legal for every sink
CARRIER_KEYS = frozenset(
    {
        "path",
        "table",
        "mode",
        "partition_by",
        "checkpoint_location",
        "trigger_interval",
        "output_mode",
    }
)


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


def validate_writer_options(fmt: str, options: dict) -> None:
    """Eager option-schema check for CLOSED-surface sinks (r11 verdict
    task #5: the budgets:/p: mapping-flattening bug showed that an
    unrecognized option silently falling through can select the WRONG
    behavior, not just be ignored).  A sink that declares
    ``option_keys`` rejects unknown keys with the valid set in the
    error; ``option_key_prefixes`` admits dotted-flattened mapping
    options (``budgets.wiki``, ``fractions.train``, ``sinks.a.path``).
    Open-surface sinks (parquet/delta/iceberg forward arbitrary keys to
    the Spark writer) declare ``option_keys = None`` and are skipped, as
    are formats not in the registry (they fail at dispatch time with
    UnsupportedFeatureError, the established contract)."""
    cls = _WRITERS.get(fmt.lower())
    if cls is None:
        return
    allowed = cls.option_keys
    if allowed is None:
        return
    prefixes = tuple(cls.option_key_prefixes)
    unknown = sorted(
        k
        for k in options
        if k not in allowed
        and k not in CARRIER_KEYS
        and not any(k.startswith(p + ".") for p in prefixes)
    )
    if unknown:
        raise ConfigError(
            f"unknown option(s) {unknown} for sink '{fmt}'; valid keys: "
            f"{sorted(allowed)} (plus {sorted(CARRIER_KEYS)}"
            + (
                f"; mapping options {sorted(prefixes)} may be nested or "
                "dotted-flattened)"
                if prefixes
                else ")"
            )
        )


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
    # exact option keys this sink consumes; None = open surface (keys
    # are forwarded to the underlying Spark writer verbatim, so any key
    # is potentially meaningful and none can be rejected)
    option_keys: frozenset[str] | None = None
    # mapping-valued options that config loading may have flattened to
    # dotted keys ("budgets.wiki": 5); "<prefix>.<anything>" is legal
    option_key_prefixes: tuple[str, ...] = ()

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
