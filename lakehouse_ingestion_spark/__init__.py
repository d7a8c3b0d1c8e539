"""lakehouse_ingestion_spark — a PySpark-native analytics / ingestion engine.

A ground-up, Spark-first re-expression of the capabilities of the reference
``adithyakeshav/lakehouse-ingestion`` (config-driven medallion lakehouse
ingestion: sources -> schema-apply -> validate -> DQ -> sinks, plus the
declared Silver/Gold operator library: dedup, CDC apply, SCD1/2, upsert,
enrichment joins, Gold aggregations), extended with large-scale
training-data-pipeline operators (fuzzy dedup, similarity search, text
analysis, multimodal plumbing).

Everything is declarative DataFrame/SQL so Catalyst optimizes the plan;
Python UDFs appear only where built-in expressions genuinely cannot express
the semantics, and then only as Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"

from lakehouse_ingestion_spark.session import get_spark, SparkConfig  # noqa: F401
