"""JDBC source (SURVEY.md D2): partitioned parallel reads + incremental
watermark predicates.

Reference declares RDBMS ingestion with incremental watermark column and
partitioned reads (``docs/02-tech-spec.md:46``, ``docs/07-developer-
guide.md:665-671``). Mapping: ``spark.read.jdbc`` with
``partitionColumn/lowerBound/upperBound/numPartitions`` for parallelism;
incremental = pushed-down predicate on the watermark column (arrives at
the DB as WHERE clauses — no full-table scan).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.sources.base import BaseReader, register_reader


@register_reader("jdbc")
class JdbcReader(BaseReader):
    def read(
        self,
        spark: SparkSession,
        options: dict,
        schema: Optional[StructType] = None,
    ) -> DataFrame:
        opts = dict(options)
        url = opts.get("url")
        if not url:
            raise ConfigError("jdbc source requires 'url'")
        if not (opts.get("dbtable") or opts.get("query")):
            raise ConfigError("jdbc source requires 'dbtable' or 'query'")

        watermark_col = opts.pop("watermarkColumn", None)
        watermark_from = opts.pop("watermarkFrom", None)
        if watermark_col and watermark_from and "dbtable" in opts:
            # incremental read: push the watermark filter into the dbtable
            # subquery so the DB does the pruning. The value is quoted into
            # the SQL text, so escape embedded quotes (checkpoint/config
            # provenance does not guarantee clean values)
            table = opts["dbtable"]
            escaped = str(watermark_from).replace("'", "''")
            opts["dbtable"] = (
                f"(SELECT * FROM {table} WHERE {watermark_col} > '{escaped}') AS _inc"
            )

        reader = spark.read.format("jdbc")
        for k, v in opts.items():
            reader = reader.option(k, v)
        df = reader.load()
        if schema is not None:
            from lakehouse_ingestion_spark.schema_validator import conform

            df = conform(df, schema, drop_extra=False)
        return df
