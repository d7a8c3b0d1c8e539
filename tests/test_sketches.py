"""Round-5 sketch/sampling operators: t-digest quantile sketches
(build, merge, rollup, estimate), batch frequent items (Misra-Gries
candidates + exact confirm), weighted Poisson sampling."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.frequent import frequent_items
from lakehouse_ingestion_spark.operators.sampling import weighted_sample
from lakehouse_ingestion_spark.operators.sketches import (
    digest_quantile,
    merge_digests,
    quantile_sketches,
    tdigest_partials,
)


def _rank_error(values: np.ndarray, est: float, q: float) -> float:
    return abs((values <= est).mean() - q)


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


def test_tdigest_rank_accuracy_uniform_and_skewed(spark):
    rng = np.random.default_rng(7)
    uni = rng.uniform(0, 1000, 20_000)
    logn = rng.lognormal(3.0, 1.5, 20_000)
    rows = [("u", float(v)) for v in uni] + [("l", float(v)) for v in logn]
    df = spark.createDataFrame(rows, "g string, v double").repartition(16)
    dig = quantile_sketches(df, ["g"], "v")
    est = dig.select(
        "g",
        digest_quantile(0.5).alias("p50"),
        digest_quantile(0.95).alias("p95"),
        digest_quantile(0.99).alias("p99"),
    ).collect()
    by_g = {r["g"]: r for r in est}
    for g, vals in (("u", uni), ("l", logn)):
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            err = _rank_error(vals, by_g[g][col], q)
            assert err <= 0.01, f"{g} {col}: rank error {err}"


def test_tdigest_merge_matches_direct_build(spark):
    """Digests built per fine group and MERGED to the coarse grain must
    estimate the coarse distribution within the (slightly looser)
    merged-rank tolerance — the mergeability contract."""
    rng = np.random.default_rng(11)
    vals = rng.normal(100, 25, 40_000)
    rows = [(int(i % 8), float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "part int, v double").repartition(16)
    fine = quantile_sketches(df.withColumn("all", F.lit(1)), ["all", "part"], "v")
    coarse = merge_digests(fine, ["all"])
    r = coarse.select(
        digest_quantile(0.5).alias("p50"), digest_quantile(0.9).alias("p90")
    ).collect()[0]
    assert _rank_error(vals, r["p50"], 0.5) <= 0.02
    assert _rank_error(vals, r["p90"], 0.9) <= 0.02
    # the digest row format is bounded: <= compression centroids
    row = coarse.collect()[0]
    assert len(row["td_means"]) <= 400
    assert row["td_n"] == 40_000


def test_tdigest_extremes_and_nulls(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", None), ("b", None)],
        "g string, v double",
    )
    dig = quantile_sketches(df, ["g"], "v")
    rows = dig.select(
        "g",
        "td_n",
        "td_min",
        "td_max",
        digest_quantile(0.0).alias("q0"),
        digest_quantile(1.0).alias("q1"),
    ).collect()
    by_g = {r["g"]: r for r in rows}
    # all-null group contributes no digest row (no quantile information)
    assert set(by_g) == {"a"}
    a = by_g["a"]
    assert (a["td_n"], a["td_min"], a["td_max"]) == (3, 1.0, 3.0)
    assert 1.0 <= a["q0"] <= a["q1"] <= 3.0


def test_tdigest_validation(spark):
    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="compression"):
        tdigest_partials(df, ["g"], "v", compression=4)
    with pytest.raises(ValueError, match="group_by"):
        tdigest_partials(df, [], "v")
    with pytest.raises(ValueError, match="to_group_by"):
        merge_digests(df, [])
    with pytest.raises(ValueError, match="quantile"):
        digest_quantile(1.5)


# ---------------------------------------------------------------------------
# frequent items
# ---------------------------------------------------------------------------


def test_frequent_items_matches_exact_groupby(spark):
    rng = np.random.default_rng(3)
    # zipf-ish: item i appears ~ 3000/i times
    items = []
    for i in range(1, 60):
        items += [f"w{i}"] * int(3000 / i)
    rng.shuffle(items)
    df = spark.createDataFrame([(s,) for s in items], "tok string").repartition(16)
    share = 0.01
    got = {
        r["item"]: (r["cnt"], r["share"])
        for r in frequent_items(df, "tok", min_share=share).collect()
    }
    n = len(items)
    exact = {
        r["tok"]: r["c"]
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("c")).collect()
        if r["c"] >= share * n
    }
    assert set(got) == set(exact)
    for it, c in exact.items():
        assert got[it][0] == c
        # share is emitted raw (round-7 rounding audit: same-integer
        # division is IEEE-exact; in-query round() can tie at binary
        # midpoints where Spark HALF_UP and DuckDB half-even disagree)
        assert got[it][1] == c / n


def test_frequent_items_survives_even_spread(spark):
    """The adversarial case for per-partition candidate generation: the
    frequent item is never a LOCAL majority anywhere — it must still
    surface via the MG threshold guarantee (no false negatives)."""
    rows = []
    # 16 partitions x (8 'hot' + 92 unique fillers) -> hot share ~7.4%
    for p in range(16):
        rows += [("hot", p)] * 8
        rows += [(f"u{p}_{i}", p) for i in range(92)]
    df = (
        spark.createDataFrame(rows, "tok string, p int")
        .repartition(16, "p")
        .drop("p")
    )
    got = frequent_items(df, "tok", min_share=0.05).collect()
    assert [r["item"] for r in got] == ["hot"]
    assert got[0]["cnt"] == 128


def test_frequent_items_nulls_and_validation(spark):
    df = spark.createDataFrame(
        [("a",), ("a",), (None,), ("b",)], "tok string"
    )
    got = {r["item"]: r["cnt"] for r in frequent_items(df, "tok", 0.5).collect()}
    # N excludes nulls: a has 2/3 share
    assert got == {"a": 2}
    with pytest.raises(ValueError, match="min_share"):
        frequent_items(df, "tok", min_share=0.0)
    with pytest.raises(ValueError, match="min_share"):
        frequent_items(df, "tok", min_share=1.0)


# ---------------------------------------------------------------------------
# weighted sampling
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_sized(spark):
    df = spark.range(0, 10_000).withColumn("w", F.lit(1))
    s1 = sorted(r["id"] for r in weighted_sample(df, "id", "w", 500.0).collect())
    s2 = sorted(r["id"] for r in weighted_sample(df, "id", "w", 500.0).collect())
    assert s1 == s2  # pure function of (key, seed, weights)
    assert 380 <= len(s1) <= 620  # ~expected_n +- 5 sd
    # a different seed decorrelates membership
    s3 = sorted(
        r["id"] for r in weighted_sample(df, "id", "w", 500.0, seed="other").collect()
    )
    assert s3 != s1


def test_weighted_sample_proportional_to_weight(spark):
    light = spark.range(0, 5_000).withColumn("w", F.lit(1))
    heavy = spark.range(5_000, 10_000).withColumn("w", F.lit(9))
    df = light.union(heavy)
    got = weighted_sample(df, "id", "w", 1_000.0).collect()
    n_light = sum(1 for r in got if r["id"] < 5_000)
    n_heavy = len(got) - n_light
    # expected 100 vs 900; allow wide stochastic slop
    assert n_heavy > 5 * n_light
    assert 700 <= n_heavy <= 1_100


def test_weighted_sample_saturated_rate_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, 1_000_000), (2, 1), (3, 1)], "id long, w long"
    )
    got = {r["id"] for r in weighted_sample(df, "id", "w", 2.0).collect()}
    assert 1 in got  # rate capped at 1.0 -> guaranteed inclusion


def test_weighted_sample_validation(spark):
    df = spark.createDataFrame([(1, None)], "id long, w long")
    from pyspark.errors import PySparkException

    with pytest.raises(PySparkException, match="non-null"):
        weighted_sample(df, "id", "w", 10.0).collect()
    with pytest.raises(ConfigError, match="positive"):
        weighted_sample(df, "id", "w", 0.0)


# ---------------------------------------------------------------------------
# pure-numpy t-digest core invariants (hypothesis, no Spark round trip)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=3_000,
    )
)
def test_td_compress_invariants(vals):
    from lakehouse_ingestion_spark.operators.sketches import _td_compress

    v = np.sort(np.asarray(vals, dtype="float64"))
    w = np.ones(len(v))
    means, weights = _td_compress(v, w, 128)
    # weight is conserved exactly, total mean to fp tolerance
    assert weights.sum() == len(v)
    assert np.isclose((means * weights).sum(), v.sum(), rtol=1e-9, atol=1e-6)
    # bounded size and sorted centroids
    assert len(means) <= 128
    assert np.all(np.diff(means) >= -1e-9)
    # every centroid mean stays inside the data range
    assert means.min() >= v[0] - 1e-9 and means.max() <= v[-1] + 1e-9


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=50,
        max_size=3_000,
    ),
    st.floats(min_value=0.01, max_value=0.99),
)
def test_td_estimate_rank_error_bound(vals, q):
    from lakehouse_ingestion_spark.operators.sketches import (
        _td_compress,
        _td_estimate,
    )

    v = np.sort(np.asarray(vals, dtype="float64"))
    means, weights = _td_compress(v, np.ones(len(v)), 256)
    est = _td_estimate(means, weights, float(v[0]), float(v[-1]), q)
    # CDF positions straddling the estimate must bracket q within ~one
    # bin width (pi/(2*256) ~ 0.62% interior; ties can widen the left
    # side, so check the bracket, not a point)
    below = (v < est).mean()
    at_or_below = (v <= est).mean()
    assert below - 0.02 <= q <= at_or_below + 0.02
