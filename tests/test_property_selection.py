import pytest
"""Property tests: the distributed prefix-sum selectors equal their SQL
window formulations on arbitrary data — ties, zero costs, tiny budgets,
lopsided strata and partition counts included."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.operators.selection import (
    stratified_budget_select,
    token_budget_select,
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 6),  # score: narrow range -> many ties
        st.integers(0, 9),  # cost: includes zero-cost rows
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=60,
)


def _df(spark, data):
    rows = [(i, s, c, d) for i, (s, c, d) in enumerate(data)]
    return spark.createDataFrame(rows, "id long, score long, cost long, dom string")


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=rows_strategy,
    budget_frac=st.sampled_from([0.0, 0.2, 0.7, 1.0]),
    n_parts=st.sampled_from([1, 3, 13]),
)
@pytest.mark.slow
def test_token_budget_matches_window(spark, data, budget_frac, n_parts):
    df = _df(spark, data)
    total = df.agg(F.coalesce(F.sum("cost"), F.lit(0))).collect()[0][0]
    budget = int(total * budget_frac)
    got = token_budget_select(
        df, "score", "cost", budget, "id", num_partitions=n_parts
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    want = df.withColumn("cum_cost", F.sum("cost").over(w)).filter(
        F.col("cum_cost") <= budget
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=rows_strategy,
    budgets=st.fixed_dictionaries(
        {
            "a": st.integers(0, 40),
            "b": st.integers(0, 40),
        }
    ),
    n_parts=st.sampled_from([1, 3, 13]),
)
@pytest.mark.slow
def test_stratified_budget_matches_window(spark, data, budgets, n_parts):
    df = _df(spark, data)
    got = stratified_budget_select(
        df, "dom", "score", "cost", budgets, "id",
        default_budget=7, num_partitions=n_parts,
    )
    w = Window.partitionBy("dom").orderBy(
        F.col("score").desc(), F.col("id").asc()
    )
    budget_expr = (
        F.when(F.col("dom") == "a", F.lit(budgets["a"]))
        .when(F.col("dom") == "b", F.lit(budgets["b"]))
        .otherwise(F.lit(7))
    )
    want = df.withColumn("cum_cost", F.sum("cost").over(w)).filter(
        F.col("cum_cost") <= budget_expr
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
