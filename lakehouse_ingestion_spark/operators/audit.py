"""Audit-column injection (SURVEY.md D4).

Every ingested dataset carries ``_ingestion_time`` and ``_source_system``
(reference ``schemas/README.md`` \"System Columns\"); Kafka-sourced data
additionally carries ``_kafka_partition/_kafka_offset/_kafka_timestamp``
(reference ``schemas/music_school/cdc/v1.json``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KAFKA_META = {
    "_kafka_partition": "partition",
    "_kafka_offset": "offset",
    "_kafka_timestamp": "timestamp",
}


def add_audit_columns(
    df: DataFrame,
    source_system: str,
    ingestion_time: Column | None = None,
    kafka_metadata: bool = False,
) -> DataFrame:
    """``ingestion_time`` injectable (a literal) for deterministic tests;
    defaults to ``current_timestamp()``."""
    ts = ingestion_time if ingestion_time is not None else F.current_timestamp()
    out = df.withColumn("_ingestion_time", ts).withColumn(
        "_source_system", F.lit(source_system)
    )
    if kafka_metadata:
        for audit_col, src_col in KAFKA_META.items():
            if src_col in df.columns:
                out = out.withColumn(audit_col, F.col(src_col))
    return out
