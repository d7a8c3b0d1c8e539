"""token_budget_select: the distributed prefix sum must equal the SQL
window formulation exactly, and must never plan a global window."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.selection import token_budget_select


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id long, score long, cost long")


def _window_reference(df, budget):
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        df.withColumn("cum_cost", F.sum("cost").over(w))
        .filter(F.col("cum_cost") <= budget)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    # deterministic pseudo-random scores WITH ties (score % 17) so the
    # id tie-break is exercised, and wildly uneven costs
    rows = [
        (i, (i * 2654435761) % 17, 1 + (i * 48271) % 97) for i in range(1, 301)
    ]
    return _frame(spark, rows)


@pytest.mark.parametrize("frac", [0.0, 0.1, 0.5, 0.93, 1.0])
def test_matches_window_formulation(spark, corpus, frac):
    total = corpus.agg(F.sum("cost")).collect()[0][0]
    budget = int(total * frac)
    got = token_budget_select(corpus, "score", "cost", budget, "id", num_partitions=7)
    assert _rows(got) == _rows(_window_reference(corpus, budget))


@pytest.mark.slow
def test_budget_zero_and_full(spark, corpus):
    total = corpus.agg(F.sum("cost")).collect()[0][0]
    assert token_budget_select(corpus, "score", "cost", 0, "id").count() == 0
    full = token_budget_select(corpus, "score", "cost", int(total), "id")
    assert full.count() == corpus.count()
    assert full.agg(F.max("cum_cost")).collect()[0][0] == total


def test_whole_cost_must_fit(spark):
    # budget cuts mid-document: the straddling doc is NOT selected
    df = _frame(spark, [(1, 10, 5), (2, 9, 5), (3, 8, 5)])
    got = _rows(token_budget_select(df, "score", "cost", 12, "id"))
    assert [r[0] for r in got] == [1, 2]  # doc 3 would overflow to 15


def test_negative_cost_raises(spark):
    df = _frame(spark, [(1, 1, -3)])
    with pytest.raises(ConfigError, match="non-negative"):
        token_budget_select(df, "score", "cost", 10, "id")


def test_negative_budget_raises(spark, corpus):
    with pytest.raises(ConfigError, match="budget"):
        token_budget_select(corpus, "score", "cost", -1, "id")


def test_no_global_window_stage(spark, corpus):
    """The whole point: no single-partition Window anywhere in the plan.
    The range exchange + mapInPandas cumsum replace it."""
    out = token_budget_select(corpus, "score", "cost", 100, "id", num_partitions=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" in plan.lower()


def test_result_independent_of_partition_count(spark, corpus):
    total = corpus.agg(F.sum("cost")).collect()[0][0]
    budget = int(total) // 3
    a = _rows(token_budget_select(corpus, "score", "cost", budget, "id", num_partitions=2))
    b = _rows(token_budget_select(corpus, "score", "cost", budget, "id", num_partitions=29))
    assert a == b


# ---------------------------------------------------------------------------
# stratified_budget_select
# ---------------------------------------------------------------------------

from lakehouse_ingestion_spark.operators.selection import (  # noqa: E402
    stratified_budget_select,
)


def _sframe(spark, rows):
    return spark.createDataFrame(rows, "id long, dom string, score long, cost long")


def _strat_reference(df, budget_of):
    w = Window.partitionBy("dom").orderBy(F.col("score").desc(), F.col("id").asc())
    cum = df.withColumn("cum_cost", F.sum("cost").over(w))
    doms = [r["dom"] for r in df.select("dom").distinct().collect()]
    keep = None
    for d in doms:
        cond = (F.col("dom").eqNullSafe(d)) & (F.col("cum_cost") <= budget_of(d))
        keep = cond if keep is None else keep | cond
    return cum.filter(keep)


@pytest.fixture(scope="module")
def strat_corpus(spark):
    rows = [
        (i, ["web", "code", "wiki"][i % 3], (i * 2654435761) % 13, 1 + (i * 48271) % 53)
        for i in range(1, 241)
    ]
    return _sframe(spark, rows)


def test_stratified_matches_window(spark, strat_corpus):
    budgets = {"web": 300, "code": 150, "wiki": 2_000_000}
    got = stratified_budget_select(
        strat_corpus, "dom", "score", "cost", budgets, "id", num_partitions=7
    )
    want = _strat_reference(strat_corpus, lambda d: budgets[d])
    assert _rows(got) == _rows(want)
    # wiki's budget exceeds its total -> every wiki row selected
    n_wiki = strat_corpus.filter(F.col("dom") == "wiki").count()
    assert got.filter(F.col("dom") == "wiki").count() == n_wiki


@pytest.mark.slow
def test_stratified_int_budget_and_default(spark, strat_corpus):
    got = stratified_budget_select(
        strat_corpus, "dom", "score", "cost", 200, "id", num_partitions=5
    )
    want = _strat_reference(strat_corpus, lambda d: 200)
    assert _rows(got) == _rows(want)
    # dict missing a stratum: default 0 drops it entirely
    sel = stratified_budget_select(
        strat_corpus, "dom", "score", "cost", {"web": 200}, "id"
    )
    assert sel.filter(F.col("dom") != "web").count() == 0
    assert sel.count() > 0


def test_stratified_null_stratum(spark):
    rows = [(1, None, 5, 10), (2, None, 4, 10), (3, "a", 9, 10)]
    df = _sframe(spark, rows)
    got = stratified_budget_select(
        df, "dom", "score", "cost", {"a": 10}, "id", default_budget=10
    )
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [1, 3]  # null stratum gets default_budget; doc 2 overflows


def test_stratified_negative_budget_raises(spark, strat_corpus):
    with pytest.raises(ConfigError):
        stratified_budget_select(strat_corpus, "dom", "score", "cost", -5, "id")
    with pytest.raises(ConfigError):
        stratified_budget_select(
            strat_corpus, "dom", "score", "cost", {"web": -1}, "id"
        )


def test_stratified_partition_count_invariance(spark, strat_corpus):
    budgets = {"web": 333, "code": 111, "wiki": 555}
    a = _rows(
        stratified_budget_select(
            strat_corpus, "dom", "score", "cost", budgets, "id", num_partitions=2
        )
    )
    b = _rows(
        stratified_budget_select(
            strat_corpus, "dom", "score", "cost", budgets, "id", num_partitions=31
        )
    )
    assert a == b


def test_stratified_no_global_window(spark, strat_corpus):
    out = stratified_budget_select(
        strat_corpus, "dom", "score", "cost", 100, "id", num_partitions=7
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# -------------------------------------------------------------- top-p


def test_top_p_select_per_stratum_mass(spark):
    from lakehouse_ingestion_spark.operators.selection import top_p_select

    df = spark.createDataFrame(
        [
            # stratum a: scores 50, 30, 15, 5 (total 100)
            (1, "a", 50), (2, "a", 30), (3, "a", 15), (4, "a", 5),
            # stratum b: 10, 10 (total 20)
            (5, "b", 10), (6, "b", 10),
        ],
        "doc_id long, dom string, score long",
    )
    out = {r["doc_id"]: r["cum_score"]
           for r in top_p_select(df, "dom", "score", 0.8, "doc_id").collect()}
    # a: 50 (prev 0) kept, 30 (prev 50) kept, 15 (prev 80 = 0.8*100,
    # NOT < 80) dropped; b at p=0.8 of 20 = 16: 10 (prev 0) kept,
    # 10 (prev 10 < 16) kept — crossing row included
    assert out == {1: 50, 2: 80, 5: 10, 6: 20}


def test_top_p_select_crossing_row_and_validation(spark):
    import pytest

    from lakehouse_ingestion_spark.errors import ConfigError
    from lakehouse_ingestion_spark.operators.selection import top_p_select

    df = spark.createDataFrame(
        [(1, "a", 7), (2, "a", 2), (3, "a", 1)], "doc_id long, dom string, score long"
    )
    # p=0.5 of 10 = 5: row 1 (prev 0 < 5) kept and already covers 70%
    out = top_p_select(df, "dom", "score", 0.5, "doc_id").collect()
    assert {r["doc_id"] for r in out} == {1}
    with pytest.raises(ConfigError, match="p must"):
        top_p_select(df, "dom", "score", 0.0, "doc_id")
    neg = spark.createDataFrame(
        [(1, "a", -1)], "doc_id long, dom string, score long"
    )
    with pytest.raises(ConfigError, match="non-negative"):
        top_p_select(neg, "dom", "score", 0.5, "doc_id")


def test_top_p_select_ties_and_nulls(spark):
    from lakehouse_ingestion_spark.operators.selection import top_p_select

    df = spark.createDataFrame(
        [(2, "a", 5), (1, "a", 5), (3, "a", None)],
        "doc_id long, dom string, score long",
    )
    out = [r["doc_id"] for r in
           top_p_select(df, "a".join([]) or "dom", "score", 0.5, "doc_id")
           .orderBy("doc_id").collect()]
    # tie broken by doc_id ASC: doc 1 first (prev 0 < 5), doc 2 prev 5
    # NOT < 5 -> dropped; NULL-score row dropped
    assert out == [1]


def test_top_p_pipeline_op(spark):
    from lakehouse_ingestion_spark.pipeline import apply_transform

    df = spark.createDataFrame(
        [(1, "a", 50), (2, "a", 30), (3, "a", 15), (4, "a", 5)],
        "doc_id long, dom string, score long",
    )
    out = apply_transform(
        df, "top_p_select",
        {"strata_col": "dom", "score_col": "score", "p": 0.8,
         "key_col": "doc_id"},
    )
    assert {r["doc_id"] for r in out.collect()} == {1, 2}
