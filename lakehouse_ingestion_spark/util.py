"""Small scale-posture utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Fan a narrow input out to the cluster before CPU-heavy per-row work.

    A single small parquet file arrives as ONE partition; any expensive
    per-row pipeline (interpreted higher-order functions, pandas UDFs)
    then runs single-threaded. At real scale inputs are already split by
    ``spark.sql.files.maxPartitionBytes``, so this is a no-op there; the
    round-robin shuffle only triggers when the input has fewer partitions
    than the target.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
