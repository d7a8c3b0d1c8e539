"""Dump .explain("formatted") for named registry queries to files.

Usage: python tools/explain_r13.py <outdir> <query> [<query> ...]
Writes <outdir>/<query>.txt for each. Suffix handling (before/after) is
the caller's job: pass e.g. plans/r13 and rename, or run with names like
`jaccard_pairs_before` mapped via --as.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    suffix = ""
    if names and names[0].startswith("--suffix="):
        suffix = names[0].split("=", 1)[1]
        names = names[1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from lakehouse_ingestion_spark.session import get_spark, SparkConfig

    spark = get_spark(SparkConfig(app_name="explain-r13"))
    qmap = {**entrymod.queries(), **entrymod.bench_extra_queries()}
    setups = entrymod.bench_setups()
    for name in names:
        fn = qmap[name]
        if name in setups:
            setups[name](spark, sf_dir)
        df = fn(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
