"""Round-13 optimization equivalence pins.

Each test pins an r13 optimization to the behavior of the shape it
replaced — exact equality, not tolerance, wherever the change claims
bit-identity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# t-digest: fused merge+estimate == merge_digests -> digest_quantile
# ---------------------------------------------------------------------------


def test_merge_digest_quantiles_bit_identical(spark):
    from lakehouse_ingestion_spark.operators.sketches import (
        digest_quantile,
        merge_digests,
        merge_digest_quantiles,
        tdigest_partials,
    )

    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("g"),
        # deterministic, non-uniform values with repeats and negatives
        ((F.col("id") * 2654435761) % 100003 / 97.0 - 300.0).alias("v"),
    )
    partials = tdigest_partials(df, ["g"], "v", compression=64)
    # old path: merge crossing + estimate crossing
    merged = merge_digests(partials, ["g"], compression=64)
    old = {
        r["g"]: (r["e50"], r["e95"])
        for r in merged.select(
            "g",
            digest_quantile(0.5).alias("e50"),
            digest_quantile(0.95).alias("e95"),
        ).collect()
    }
    # new path: one fused crossing
    new = {
        r["g"]: (r["e50"], r["e95"])
        for r in merge_digest_quantiles(
            partials, ["g"], {"e50": 0.5, "e95": 0.95}, compression=64
        ).collect()
    }
    assert set(old) == set(new) and len(old) == 7
    for g in old:
        # bit-identical doubles, not approx: same numpy ops on the same
        # float64 arrays
        assert old[g] == new[g], f"group {g}: {old[g]} != {new[g]}"


def test_merge_digest_quantiles_validates_inputs(spark):
    from lakehouse_ingestion_spark.operators.sketches import (
        merge_digest_quantiles,
        tdigest_partials,
    )

    df = spark.range(0, 10).select(
        F.lit("a").alias("g"), F.col("id").cast("double").alias("v")
    )
    partials = tdigest_partials(df, ["g"], "v")
    with pytest.raises(ValueError, match="non-empty"):
        merge_digest_quantiles(partials, [], {"e": 0.5})
    with pytest.raises(ValueError, match="in \\[0,1\\]"):
        merge_digest_quantiles(partials, ["g"], {"e": 1.5})


# ---------------------------------------------------------------------------
# cache hygiene: no registry query leaves pinned blocks behind after its
# action + release (r12 verdict item 3 / r13 item 5)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["jaccard_pairs", "cms_topk", "winnow_overlap"])
def test_no_pinned_rdds_survive_release(spark, sf_dir, name):
    """The r12 persist() leaks (jaccard_join src, q_cms_topk exact,
    q_winnow_overlap fps) are now eager localCheckpoints: after the
    query's action and the bench's release_local_checkpoint call,
    NOTHING stays pinned in executor storage."""
    import time

    import __spark_entry__ as entry
    from lakehouse_ingestion_spark.checkpoint import release_local_checkpoint

    spark.catalog.clearCache()
    jsc = spark.sparkContext._jsc
    # some earlier test may legitimately hold pins; measure the delta
    before = jsc.getPersistentRDDs().size()
    df = entry.queries()[name](spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    released = release_local_checkpoint(df)
    assert released >= 1, f"{name} expected to pin at least one frame"
    # unpersist is async; give the block manager a moment
    for _ in range(50):
        if jsc.getPersistentRDDs().size() <= before:
            break
        time.sleep(0.1)
    assert jsc.getPersistentRDDs().size() <= before, (
        f"{name} left {jsc.getPersistentRDDs().size() - before} pinned "
        "RDD(s) behind after action + release"
    )


# ---------------------------------------------------------------------------
# bucketed writes: bounded file counts (guide §6)
# ---------------------------------------------------------------------------


def test_write_bucketed_bounds_file_count(spark, tmp_path):
    """A many-partition input must still produce exactly one file per
    bucket (pre-r13 every input task wrote a file per bucket it touched
    — tasks x buckets small files)."""
    import glob

    from lakehouse_ingestion_spark.sinks.bucketed import write_bucketed

    loc = tmp_path / "btdb"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS __btr13 LOCATION '{loc}'")
    try:
        spark.sql("DROP TABLE IF EXISTS __btr13.t")
        df = spark.range(0, 10_000, 1, 16).select(
            F.col("id").alias("k"), (F.col("id") % 97).alias("v")
        )
        write_bucketed(df, "__btr13.t", ["k"], 4, sort_columns=["k"])
        files = glob.glob(f"{loc}/t/*.parquet")
        assert len(files) == 4, f"expected 4 bucket files, got {len(files)}"
        assert spark.table("__btr13.t").count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS __btr13.t")
        spark.sql("DROP DATABASE IF EXISTS __btr13")


# ---------------------------------------------------------------------------
# decontaminate / contamination_report: shared eval-side n-gram build
# ---------------------------------------------------------------------------


def test_shared_eval_ngrams_results_identical(spark, sf_dir):
    from lakehouse_ingestion_spark.operators.decontaminate import (
        contamination_report,
        decontaminate,
        eval_ngram_pairs,
    )

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ev = d.filter("doc_id % 53 = 0").select(
        F.col("doc_id").alias("eval_id"), "text"
    )
    tr = d.filter("doc_id % 53 <> 0")
    # pipeline path: eval set exploded ONCE, shared by both passes
    pairs = eval_ngram_pairs(ev).localCheckpoint()
    rep_shared = contamination_report(tr, ev, eval_ngrams=pairs)
    dec_shared = decontaminate(
        tr, ev, eval_ngrams=pairs.select("shingle").distinct()
    )
    # default (per-call build) path
    rep_default = contamination_report(tr, ev)
    dec_default = decontaminate(tr, ev)
    assert rep_shared.exceptAll(rep_default).count() == 0
    assert rep_default.exceptAll(rep_shared).count() == 0
    assert dec_shared.exceptAll(dec_default).count() == 0
    assert dec_default.exceptAll(dec_shared).count() == 0
    # and the shared path really did drop the eval-side explode: the
    # checkpointed pairs frame appears as a scan leaf, no Generate over
    # the eval docs remains in the report plan (the train side keeps its
    # one corpus explode)
    plan = rep_shared._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Generate explode") == 1


def test_merge_digest_quantiles_single_python_stage(spark):
    """The fused path's plan carries ONE FlatMapGroupsInPandas and NO
    ArrowEvalPython above it (the crossing the fusion removes)."""
    from lakehouse_ingestion_spark.operators.sketches import (
        merge_digest_quantiles,
        tdigest_partials,
    )

    df = spark.range(0, 100).select(
        (F.col("id") % 3).alias("g"), F.col("id").cast("double").alias("v")
    )
    out = merge_digest_quantiles(
        tdigest_partials(df, ["g"], "v"), ["g"], {"e50": 0.5}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert "ArrowEvalPython" not in plan
