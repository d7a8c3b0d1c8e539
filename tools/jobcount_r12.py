"""Count Spark jobs (actions) a registry query runs, via the status
tracker — the fixed-cost profile of eager operators (guide §1):

  python tools/jobcount_r12.py er_clusters share_admission
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from lakehouse_ingestion_spark.checkpoint import release_local_checkpoint
    from lakehouse_ingestion_spark.session import get_spark, SparkConfig

    spark = get_spark(SparkConfig(app_name="jobcount-r12"))
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qmap = {**entrymod.queries(), **entrymod.bench_extra_queries()}
    setups = entrymod.bench_setups()
    tracker = spark.sparkContext.statusTracker()
    for name in sys.argv[1:]:
        fn = qmap[name]
        if name in setups:
            setups[name](spark, sf_dir)
        gc.collect()
        spark.catalog.clearCache()
        before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        release_local_checkpoint(df)
        after = set(tracker.getJobIdsForGroup(None) or [])
        new = sorted(after - before)
        stages = 0
        for j in new:
            info = tracker.getJobInfo(j)
            if info is not None:
                stages += len(info.stageIds)
        print(f"{name}: jobs={len(new)} stages={stages} wall={wall}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
