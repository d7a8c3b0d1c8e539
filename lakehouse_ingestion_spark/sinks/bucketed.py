"""Bucketed-table writes for co-located (shuffle-free) joins.

At 100 TB the dominant cost of fact-to-fact joins is shuffling both
sides on the join key. Pre-bucketing both tables on that key
(``bucketBy`` + ``sortBy``, hash-partitioned files registered in the
catalog) lets Spark plan a SortMergeJoin with ZERO exchanges — each
bucket pair joins locally. The reference stores plain parquet and
re-shuffles every join; this is the Spark-native fix.

Requirements for the exchange-free plan:
- both sides bucketed on the join key with the SAME bucket count;
- ``spark.sql.sources.bucketing.enabled`` (default true);
- join keys must cover the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_columns: list[str],
    num_buckets: int,
    sort_columns: list[str] | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (and optionally sort-ordered) catalog
    table. Sizing guidance: pick ``num_buckets`` so each bucket lands in
    the 128 MB-1 GB range at full scale; bucket counts should be shared
    across tables that join together."""
    # Cluster rows to their bucket BEFORE the write (r13, guide §6):
    # without it every input task opens a file per bucket it touches —
    # tasks x buckets small files (32 scan tasks x 8 buckets = up to 256
    # files per table on the bench fixture). repartition on the bucket
    # columns uses the same Murmur3-pmod placement as bucketBy, so each
    # task holds exactly one whole bucket -> one file per bucket, sized
    # by the num_buckets guidance above.
    w = (
        df.repartition(num_buckets, *[F.col(c) for c in bucket_columns])
        .write.format(format)
        .mode(mode)
        .bucketBy(num_buckets, *bucket_columns)
    )
    if sort_columns:
        w = w.sortBy(*sort_columns)
    w.saveAsTable(table)


def bucketed_join_ready(spark, left_table: str, right_table: str) -> bool:
    """True when both tables exist and bucketing is enabled — the
    preconditions for an exchange-free bucket join."""
    return (
        spark.conf.get("spark.sql.sources.bucketing.enabled", "true") == "true"
        and spark.catalog.tableExists(left_table)
        and spark.catalog.tableExists(right_table)
    )
