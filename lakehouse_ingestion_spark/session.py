"""SparkSession factory with scale-oriented defaults.

Parity: the reference builds a bare session and relies on deployment conf
for AQE/shuffle tuning (``core/IngestionRunner.scala:38-41``,
``helm/values.yaml:59-61``). Here the engine owns those defaults so every
entry point (tests, bench, pipeline runner) gets the same scale posture:

- AQE on (runtime re-plan, partition coalescing, skew-join splitting);
- broadcast threshold generous enough that dimension tables broadcast;
- Arrow enabled for the pandas-UDF paths;
- shuffle partitions sized for the local core count by default, and meant
  to be raised (e.g. 2-3x total executor cores) on a real cluster.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class SparkConfig:
    """Tunable knobs; defaults target local[*] testing but every knob is the
    one you would turn on a 1000-executor cluster."""

    app_name: str = "lakehouse-ingestion-spark"
    master: str | None = None  # None -> respect spark.master env / local[*]
    shuffle_partitions: int | None = None  # None -> 2x default parallelism
    max_partition_bytes: str = "128m"  # parquet split target
    broadcast_threshold: str = "64m"  # dims up to this size broadcast
    ansi: bool = True
    session_timezone: str = "UTC"
    ui_enabled: bool = False
    extra: dict = field(default_factory=dict)


def get_spark(cfg: SparkConfig | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession."""
    cfg = cfg or SparkConfig()
    master = cfg.master or os.environ.get("SPARK_GRAFT_MASTER")
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"

    b = SparkSession.builder.appName(cfg.app_name).master(master)

    # --- scale posture -----------------------------------------------------
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", cfg.broadcast_threshold)
        .config("spark.sql.files.maxPartitionBytes", cfg.max_partition_bytes)
        .config("spark.sql.parquet.filterPushdown", "true")
        # read parquet TIMESTAMP(NANOS) as long (Spark has no nanos type);
        # callers convert via timestamp_micros(ns div 1000)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", cfg.session_timezone)
        .config("spark.sql.ansi.enabled", str(cfg.ansi).lower())
        .config("spark.ui.enabled", str(cfg.ui_enabled).lower())
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # reused Arrow workers keep their PEAK rss forever (glibc never
        # returns it); a worker that once held a large matmul tile or
        # Arrow batch pins that memory for the session. Reap workers
        # idle >5 min so long-lived sessions shed those peaks (the
        # sf10 full-registry run was OOM-killed by exactly this before
        # the operators were tiled; this is the engine-wide backstop)
        .config("spark.python.worker.idleTimeoutSeconds", "300")
        .config("spark.python.worker.killOnIdleTimeout", "true")
    )
    if cfg.shuffle_partitions is not None:
        b = b.config("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    else:
        # local heuristic: 2x cores; on a cluster, set explicitly via extra
        ncores = os.cpu_count() or 8
        b = b.config("spark.sql.shuffle.partitions", str(min(2 * ncores, 64)))
    for k, v in cfg.extra.items():
        b = b.config(k, str(v))

    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
