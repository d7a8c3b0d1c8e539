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
