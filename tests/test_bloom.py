"""Bloom membership pre-screen (operators/bloom): the no-false-negative
contract, fp-rate sanity, exact end-to-end dedup, lossless merge, and
the map-side plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.operators.bloom import (
    MAX_WORDS,
    bloom_build,
    bloom_dedup,
    bloom_merge,
    bloom_screen,
)
from lakehouse_ingestion_spark.plans import audit


def _keys(spark, lo, hi, prefix="k"):
    return spark.range(lo, hi).select(
        F.concat(F.lit(f"{prefix}-"), F.col("id")).alias("key")
    )


def test_no_false_negatives(spark):
    hist = _keys(spark, 0, 3000)
    blm = bloom_build(hist, "key", expected_items=3000, fpp=0.01)
    screened = bloom_screen(hist, blm, "key")
    assert screened.where(~F.col("maybe_seen")).count() == 0


def test_fp_rate_near_configured(spark):
    hist = _keys(spark, 0, 5000)
    blm = bloom_build(hist, "key", expected_items=5000, fpp=0.01)
    fresh = _keys(spark, 100_000, 105_000)  # disjoint by construction
    fp = bloom_screen(fresh, blm, "key").where(F.col("maybe_seen")).count()
    # 5000 draws at p=0.01 → ~50 expected; 3x headroom kills flake
    assert fp / 5000 < 0.03


def test_dedup_exact_vs_plain_join(spark):
    hist = _keys(spark, 0, 2000)
    batch = _keys(spark, 1500, 3000)  # 500 dups, 1000 new
    blm = bloom_build(hist, "key", expected_items=2000, fpp=0.05)
    got = bloom_dedup(batch, hist, blm, "key").select("key", "is_dup")
    want = batch.join(
        hist.withColumn("__t", F.lit(True)), "key", "left"
    ).select("key", F.coalesce("__t", F.lit(False)).alias("is_dup"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    assert got.where("is_dup").count() == 500


def test_merge_equals_union_build(spark):
    a, b = _keys(spark, 0, 800), _keys(spark, 700, 1500)
    cfg = dict(expected_items=2000, fpp=0.01)
    merged = bloom_merge(
        bloom_build(a, "key", **cfg), bloom_build(b, "key", **cfg)
    ).collect()[0]
    union = bloom_build(a.union(b), "key", **cfg).collect()[0]
    assert merged.words == union.words
    assert (merged.n_bits, merged.num_hashes) == (union.n_bits, union.num_hashes)


def test_merge_geometry_mismatch_raises(spark):
    a = bloom_build(_keys(spark, 0, 100), "key", 1000, 0.01)
    b = bloom_build(_keys(spark, 0, 100), "key", 50, 0.1)
    with pytest.raises(Exception, match="geometry"):
        bloom_merge(a, b).collect()


def test_null_keys_screen_null_and_dedup_false(spark):
    hist = _keys(spark, 0, 100)
    blm = bloom_build(hist, "key", 1000, 0.01)
    batch = spark.createDataFrame([("k-5",), (None,)], "key string")
    rows = {
        r.key: r.maybe_seen for r in bloom_screen(batch, blm, "key").collect()
    }
    assert rows["k-5"] is True
    assert rows[None] is None
    dd = {r.key: r.is_dup for r in bloom_dedup(batch, hist, blm, "key").collect()}
    assert dd["k-5"] is True
    assert dd[None] is False


def test_geometry_validation():
    import lakehouse_ingestion_spark.operators.bloom as bl

    with pytest.raises(ValueError, match="expected_items"):
        bl._geometry(0, 0.01)
    with pytest.raises(ValueError, match="fpp"):
        bl._geometry(100, 1.5)
    with pytest.raises(ValueError, match="shard"):
        bl._geometry(MAX_WORDS * 64, 1e-9)


def test_screen_plan_is_map_side(spark):
    """The probe adds NO shuffle to the batch: one broadcast attach of
    the 1-row filter, codegen'd position checks, no Python."""
    hist = _keys(spark, 0, 1000)
    blm = bloom_build(hist, "key", 1000, 0.01)
    screened = bloom_screen(_keys(spark, 0, 500), blm, "key")
    a = audit(screened)
    assert a.shuffle_exchanges == 0
    assert a.broadcast_exchanges == 1
    assert not a.python_in_plan
    assert a.joins.get("CartesianProduct", 0) == 0


def test_dedup_plan_joins_only_maybe_rows(spark, entrymod=None):
    """The exact verification join's stream side carries the bloom
    predicate — definitely-new rows never reach it."""
    import __spark_entry__ as em

    df = em.queries()["bloom_dedup"](spark, "/root/testdata/sf0.001")
    a = audit(df)
    assert a.joins.get("CartesianProduct", 0) == 0
    assert not a.python_in_plan
    # the maybe-branch filter appears in the optimized plan ahead of the
    # history join (the unrolled xxhash64 probes gate the join input)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "xxhash64" in plan


def test_sharded_geometry_past_single_filter_cap():
    """The single-filter build refuses past MAX_WORDS; the sharded
    geometry accepts the same keyspace by splitting it, keeping every
    per-shard bitmap under the cap."""
    from lakehouse_ingestion_spark.operators.bloom import (
        MAX_WORDS,
        sharded_geometry,
        _geometry,
    )

    big_n = 20_000_000_000  # ~2e10 keys at 1% fpp: way past one filter
    with pytest.raises(ValueError, match="shard the"):
        _geometry(big_n, 0.01)
    ns, m, k = sharded_geometry(big_n, 0.01)
    assert ns > 1
    assert m // 64 <= MAX_WORDS
    # per-shard geometry matches a single filter over the slice
    m1, k1 = _geometry(-(-big_n // ns), 0.01)
    assert (m, k) == (m1, k1)
    # explicit shard count honored; bad values refused
    assert sharded_geometry(1000, 0.01, num_shards=7)[0] == 7
    with pytest.raises(ValueError, match="num_shards"):
        sharded_geometry(1000, 0.01, num_shards=0)


def test_sharded_build_lazy_frame_past_cap(spark):
    """Past-cap sharded build plans (schema + shard count) without
    materializing terabytes of bitmap."""
    from lakehouse_ingestion_spark.operators.bloom import bloom_build_sharded

    df = _keys(spark, 0, 10)
    blm = bloom_build_sharded(df, "key", expected_items=20_000_000_000)
    assert {"shard", "n_shards", "words"} <= set(blm.columns)


def test_sharded_dedup_matches_unsharded_and_join(spark):
    """bloom_dedup over a sharded filter == unsharded filter == exact
    join; no false negatives shard-wise."""
    from lakehouse_ingestion_spark.operators.bloom import bloom_build_sharded

    hist = _keys(spark, 0, 2000)
    batch = _keys(spark, 1500, 3000)
    blm_s = bloom_build_sharded(
        hist, "key", expected_items=2000, fpp=0.05, num_shards=8
    )
    assert blm_s.count() == 8
    got = bloom_dedup(batch, hist, blm_s, "key").select("key", "is_dup")
    want = batch.join(
        hist.withColumn("__t", F.lit(True)), "key", "left"
    ).select("key", F.coalesce("__t", F.lit(False)).alias("is_dup"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
    # no false negatives: every seen key screens maybe_seen=True
    screened = bloom_screen(hist, blm_s, "key")
    assert screened.where(~F.col("maybe_seen")).count() == 0


def test_sharded_merge_equals_union_build(spark):
    from lakehouse_ingestion_spark.operators.bloom import (
        bloom_build_sharded,
        bloom_merge_sharded,
    )

    cfg = dict(expected_items=2000, fpp=0.01, num_shards=4)
    a, b = _keys(spark, 0, 800), _keys(spark, 700, 1500)
    merged = bloom_merge_sharded(
        bloom_build_sharded(a, "key", **cfg),
        bloom_build_sharded(b, "key", **cfg),
    )
    union = bloom_build_sharded(a.unionByName(b).distinct(), "key", **cfg)
    m = {r["shard"]: r["words"] for r in merged.collect()}
    u = {r["shard"]: r["words"] for r in union.collect()}
    assert m == u

    bad = bloom_build_sharded(b, "key", expected_items=2000, fpp=0.01,
                              num_shards=4).withColumn("seed", F.lit(99))
    with pytest.raises(Exception, match="geometry"):
        bloom_merge_sharded(
            bloom_build_sharded(a, "key", **cfg), bad
        ).collect()


def test_sharded_screen_null_keys(spark):
    from lakehouse_ingestion_spark.operators.bloom import bloom_build_sharded

    hist = _keys(spark, 0, 100)
    blm = bloom_build_sharded(hist, "key", expected_items=100, num_shards=3)
    batch = spark.createDataFrame([(None,), ("k5",)], "key string")
    rows = {r["key"]: r["maybe_seen"] for r in
            bloom_screen(batch, blm, "key").collect()}
    assert rows[None] is None


def test_sharded_bloom_properties_hypothesis(spark):
    """Property sweep over shard counts and geometries: (a) NO false
    negatives ever — every built key screens maybe_seen=True; (b) the
    sharded and unsharded dedup answers are identical; (c) shard
    assignment covers all rows (left join never drops)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from lakehouse_ingestion_spark.operators.bloom import bloom_build_sharded

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        n_keys=st.integers(50, 400),
        num_shards=st.integers(1, 13),
        fpp=st.sampled_from([0.01, 0.05, 0.2]),
        seed=st.integers(0, 3),
    )
    def prop(n_keys, num_shards, fpp, seed):
        hist = spark.range(n_keys).select(
            F.concat(F.lit("key_"), F.col("id")).alias("key")
        )
        blm = bloom_build_sharded(
            hist, "key", expected_items=n_keys, fpp=fpp,
            num_shards=num_shards, seed=seed,
        )
        rows = blm.collect()
        assert len(rows) == num_shards
        screened = bloom_screen(hist, blm, "key")
        assert screened.count() == n_keys          # no rows dropped
        assert screened.where(~F.col("maybe_seen")).count() == 0

    prop()
