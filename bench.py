"""Benchmark harness: runs the headline query set at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query executes fully via the noop datasource sink (measures plan
execution without result materialization on the driver).
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = None

    import __spark_entry__ as entrymod
    from lakehouse_ingestion_spark.checkpoint import release_local_checkpoint
    from lakehouse_ingestion_spark.session import get_spark, SparkConfig

    # master resolution (SPARK_GRAFT_CPUS -> local[N]) lives in get_spark
    spark = get_spark(SparkConfig(app_name="lakehouse-bench"))

    # warm up the JVM / codegen / python-worker pool so the first measured
    # query doesn't absorb session startup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    from pyspark.sql import functions as F

    spark.range(0, 1024, 1, 32).groupBy(F.col("id") % 32).applyInPandas(
        lambda pdf: pdf.head(1), "id long"
    ).count()
    # mapInArrow has its own first-use worker codepath (Arrow stream
    # serde), separate from the pandas one — warm it too
    spark.range(0, 1024, 1, 32).mapInArrow(lambda it: it, "id long").count()
    # ...and scalar pandas UDFs (ArrowEvalPython) a third one, used by the
    # t-digest quantile estimates
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _warm(s):
        return s

    spark.range(0, 1024, 1, 32).select(_warm("id")).count()

    timings: dict[str, float] = {}
    setups = getattr(entrymod, "bench_setups", dict)()

    def probe(name: str, fn) -> float:
        """One timed noop-sink execution of a registry query (post-run
        checkpoint release is NOT billed to the probe)."""
        gc.collect()
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 4)
        release_local_checkpoint(df)
        return elapsed

    bench_only = getattr(entrymod, "bench_extra_queries", dict)()
    for name, fn in {**entrymod.queries(), **bench_only}.items():
        # timer wraps fn() too (some queries do eager work inside), and a
        # query must not pin cache into its successors' measurements.
        # gc.collect() releases this query's py4j proxies so the JVM
        # ContextCleaner can reclaim whatever localCheckpoint blocks the
        # explicit release below can't reach (frames internal to an
        # operator that aren't leaves of the returned plan).
        # timer wraps fn() too (some queries do eager work inside), and
        # a query must not pin cache into its successors' measurements;
        # probe() clears cache + gc per run. The post-probe checkpoint
        # release inside probe() obeys the CONTRACT asserted by
        # tests/test_bench_contract.py: it unpersists EVERY LogicalRDD
        # leaf of the returned plan, which is only safe because no
        # registry query's frame embeds a SHARED pinned RDD —
        # bench_setups persist cross-query state to parquet paths, never
        # to module-level checkpointed frames. A query that needs a
        # long-lived pinned frame must re-pin per call (cheap) or the
        # release would free its blocks irrecoverably (lineage is
        # truncated) and LATER uses would die with missing-block errors
        # far from the release site.
        if name in setups:
            # one-time build phases (e.g. bucketed table writes) are an
            # ingest investment — bill them to <name>_build, not the probe
            gc.collect()
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            setups[name](spark, sf_dir)
            timings[f"{name}_build"] = round(time.perf_counter() - t0, 4)
        timings[name] = probe(name, fn)

    # Stability pass (round-7 verdict #3): single-shot timings on a busy
    # box swing up to 4.4x on unchanged code, manufacturing phantom
    # regressions in the driver artifact. Any query that moved >= 1.5x in
    # either direction vs the PREVIOUS committed BENCH_QUERIES.json gets
    # two more runs and reports the median-of-3 — real regressions
    # reproduce, VM noise doesn't.
    here = os.path.dirname(os.path.abspath(__file__))
    reruns: dict[str, list[float]] = {}
    prev_path = os.path.join(here, "BENCH_QUERIES.json")
    try:
        with open(prev_path) as f:
            prev = json.load(f)
        prev_q = prev.get("queries", {}) if prev.get("sf") == sf else {}
    except (OSError, ValueError):
        prev_q = {}
    qmap = entrymod.queries()
    for name, t in list(timings.items()):
        old = prev_q.get(name)
        if name not in qmap or not old or old <= 0:
            continue  # _build rows and new queries can't be "movers"
        ratio = t / old
        if 2 / 3 < ratio < 1.5:
            continue
        runs = [t, probe(name, qmap[name]), probe(name, qmap[name])]
        reruns[name] = runs
        timings[name] = sorted(runs)[1]

    total = round(sum(timings.values()), 4)
    # High-precision per-query map + rerun evidence go to a side artifact;
    # the FINAL stdout line carries the REAL per-query map (driver contract:
    # the driver's parser only reads the final line, so hiding the map behind
    # a pointer made optimization rounds unmeasurable — r12 verdict item 1).
    # Values are rounded to 2 decimals so 150+ entries stay well inside the
    # driver's bounded tail capture (~4 KB vs the r4 overflow at 4-decimal
    # precision plus a duplicate non-final map line).
    with open(os.path.join(here, "BENCH_QUERIES.json"), "w") as f:
        json.dump(
            {"sf": sf, "total_sec": total, "queries": timings, "reruns": reruns},
            f,
            indent=1,
        )
    print(
        json.dumps(
            {
                "metric": "query_set_wall_clock",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "queries": {k: round(v, 2) for k, v in timings.items()},
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
