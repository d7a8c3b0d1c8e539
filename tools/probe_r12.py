"""Targeted same-session probe for round-12 optimization A/Bs.

Usage: python tools/probe_r12.py <query> [<query> ...] [--runs N]
Times each named registry query N times (default 3) through the same
noop-sink harness bench.py uses, in ONE session, printing every sample
and the median.  Job descriptions are set so the UI/event log is
readable (guide §1.5).
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from lakehouse_ingestion_spark.checkpoint import release_local_checkpoint
    from lakehouse_ingestion_spark.session import get_spark, SparkConfig

    spark = get_spark(SparkConfig(app_name="probe-r12"))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qmap = {**entrymod.queries(), **entrymod.bench_extra_queries()}
    setups = entrymod.bench_setups()
    for name in args:
        fn = qmap[name]
        if name in setups:
            setups[name](spark, sf_dir)
        samples = []
        for i in range(runs):
            gc.collect()
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"probe {name} #{i}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            release_local_checkpoint(df)
        med = sorted(samples)[len(samples) // 2]
        print(f"{name}: median={med} samples={samples}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
