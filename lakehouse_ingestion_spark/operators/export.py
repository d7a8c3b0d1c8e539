"""Deterministic training-data export: global shuffle + fixed shards.

Training jobs consume a corpus as N equal-ish shard files in a fixed,
reproducible random order — "shuffle once, globally, at export time" so
data loaders stream sequentially (Lee et al. ACL'22 export convention;
every epoch-level reshuffle then permutes SHARDS, not rows).  A naive
``ORDER BY rand()`` is nondeterministic AND plans a global sort; this
module gets the same statistical effect from a content hash:

- shuffle position = ``md5(key || seed)`` reduced to 60 bits — a pure
  projection, identical in DuckDB
  (``('0x' || substr(md5(x),1,15))::BIGINT``), so the permutation is a
  reproducible function of (key, seed) and re-exports are byte-stable.
- shard = ``position % n_shards`` — uniform by construction, so shards
  balance without measuring anything; changing the seed is a fresh
  permutation.
- within-shard order = position ASC (key ASC breaks 60-bit collisions) —
  ``sortWithinPartitions`` after ONE hash exchange on ``shard``; no
  global sort stage anywhere.

At 100 TB: one exchange (the unavoidable one — rows must move to their
shard), map-side nothing, reduce-side a local sort that spills cleanly.
``n_shards`` should be chosen so a shard fits a training reader
(~corpus/n_shards bytes); ``max_records_per_file`` further splits files
without breaking order (parquet part files sort lexicographically).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.functions.similarity import md5_hash60


def shuffle_position(key: Column | str, seed: str = "export") -> Column:
    """60-bit deterministic shuffle position for a row key (the global
    random order, as a pure projection). NULL keys raise loudly — a NULL
    cannot be placed reproducibly."""
    k = F.col(key) if isinstance(key, str) else key
    pos = md5_hash60(F.concat(k.cast("string"), F.lit(f"\x1f{seed}")))
    return F.when(
        k.isNull(), F.raise_error(F.lit("export shuffle key must not be NULL"))
    ).otherwise(pos)


def shard_assign(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    seed: str = "export",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Attach (shard, pos): the shard a row belongs to and its 1-based
    rank within the shard under the deterministic shuffle order.

    The rank window partitions by ``shard_col`` — parallelism = number of
    shards, each a within-partition sort, never a single global window.
    """
    if n_shards <= 0:
        raise ConfigError(f"n_shards must be positive, got {n_shards}")
    p = shuffle_position(key_col, seed)
    out = df.withColumn("_spos", p).withColumn(
        shard_col, (F.col("_spos") % n_shards).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("_spos"), F.col(key_col))
    return out.withColumn(pos_col, F.row_number().over(w)).drop("_spos")


def export_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    seed: str = "export",
    shard_col: str = "shard",
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``path/shard=K/`` parquet, rows inside each shard
    in the deterministic shuffle order.

    ONE exchange: ``repartition(n_shards, shard)`` routes each shard
    value to exactly one task (several shards may share a task — each
    still lands in its own directory via ``partitionBy``, one file per
    shard unless ``max_records_per_file`` splits it).  The sort is
    within-partition only.
    """
    if n_shards <= 0:
        raise ConfigError(f"n_shards must be positive, got {n_shards}")
    staged = (
        df.withColumn("_spos", shuffle_position(key_col, seed))
        .withColumn(shard_col, (F.col("_spos") % n_shards).cast("int"))
        .repartition(n_shards, F.col(shard_col))
        .sortWithinPartitions(shard_col, "_spos", key_col)
    )
    writer = staged.drop("_spos").write.mode(mode).partitionBy(shard_col)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)
