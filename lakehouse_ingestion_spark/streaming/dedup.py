"""Streaming deduplication — the stateful complement of
``operators/dedup.py`` for continuous ingest.

Two tiers, matching Spark's state-store semantics:

- ``streaming_dedup``: ``dropDuplicates(keys)`` — exact, but state grows
  forever (every key ever seen is remembered). Only for bounded key
  domains (dimension upserts, config topics).
- ``streaming_dedup_within_watermark``: watermark +
  ``dropDuplicatesWithinWatermark`` — the production shape for event
  streams: duplicates are only possible within the at-least-once
  redelivery horizon (minutes, not forever), so state is evicted once
  the watermark passes and memory stays bounded no matter how long the
  stream runs. This is the 100 TB/day posture: state size tracks the
  de-dup horizon, not the corpus.

The reference ingests Kafka without any dedup step
(`io/KafkaReader.scala` has no duplicate handling;
`docs/01-problem-statement.md:27` names exactly-once vs at-least-once
across sinks as an open difficulty); redelivered records after a
non-clean restart still reach the sink there. This module closes that
gap Spark-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from lakehouse_ingestion_spark.errors import ConfigError


def streaming_dedup(df: DataFrame, keys: list[str]) -> DataFrame:
    """Exact streaming dedup on ``keys`` with UNBOUNDED state — see
    module docstring for when that is acceptable."""
    if not keys:
        raise ConfigError("streaming_dedup needs at least one key column")
    return df.dropDuplicates(keys)


def streaming_dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    event_time: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Drop redelivered duplicates of ``keys`` arriving within the
    watermark ``delay`` of the first occurrence; state for keys older
    than the watermark is evicted. ``event_time`` must be the stream's
    event-time column (it is added to the watermark, not the dedup key).
    """
    if not keys:
        raise ConfigError("streaming_dedup needs at least one key column")
    if event_time in keys:
        raise ConfigError(
            "event_time participates in watermarking, not in the dedup key; "
            f"remove {event_time!r} from keys"
        )
    return df.withWatermark(event_time, delay).dropDuplicatesWithinWatermark(keys)
