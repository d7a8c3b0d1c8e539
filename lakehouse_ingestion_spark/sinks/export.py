"""Shard-export sink: ``target: format: shards`` writes the frame as
``path/shard=K/`` parquet in the deterministic shuffle order
(operators/export.export_shards) — the training-reader handoff layout.

Batch-only and overwrite-only by design: appending a second run's part
files into existing shard directories would interleave two shuffle
orders lexicographically, silently breaking the "file row order IS the
global shuffle order" contract the layout exists to provide.  Streaming
exports should land epochs via the multi-sink ledger and re-shard in a
batch compaction pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lakehouse_ingestion_spark.errors import ConfigError, UnsupportedFeatureError
from lakehouse_ingestion_spark.operators.export import export_shards
from lakehouse_ingestion_spark.sinks.base import (
    BaseWriter,
    WriteOptions,
    register_writer,
)


@register_writer("shards")
class ShardExportWriter(BaseWriter):
    aliases = ["shard_export"]
    option_keys = frozenset(
        {"key_col", "n_shards", "seed", "shard_col", "max_records_per_file"}
    )

    def write_batch(self, df: DataFrame, opts: WriteOptions) -> None:
        o = opts.options
        if "key_col" not in o:
            raise ConfigError("shards sink requires options.key_col")
        if opts.mode != "overwrite":
            raise ConfigError(
                "shards sink is overwrite-only: appending part files would "
                "interleave two shuffle orders within a shard directory"
            )
        mrpf = o.get("max_records_per_file")
        export_shards(
            df,
            opts.target,
            key_col=o["key_col"],
            n_shards=int(o.get("n_shards", 64)),
            seed=o.get("seed", "export"),
            shard_col=o.get("shard_col", "shard"),
            max_records_per_file=int(mrpf) if mrpf else None,
            mode=opts.mode,
        )

    def write_streaming(self, df: DataFrame, opts: WriteOptions):
        raise UnsupportedFeatureError(
            "shards sink is batch-only (a per-trigger reshard would rewrite "
            "every shard); land stream epochs via multi_sink and re-shard in "
            "a batch compaction pass"
        )
