"""Bucketed co-located join: the whole point is ZERO exchanges on the
join — asserted via the plan audit."""

from __future__ import annotations

import pytest

from lakehouse_ingestion_spark.plans import audit
from lakehouse_ingestion_spark.sinks.bucketed import (
    bucketed_join_ready,
    write_bucketed,
)


@pytest.fixture()
def bucketed_tables(spark):
    facts = spark.range(0, 10_000, 1, 8).selectExpr(
        "id as k", "id * 2 as fact_v"
    )
    dims = spark.range(0, 1_000, 1, 4).selectExpr("id as k", "id * 3 as dim_v")
    write_bucketed(facts, "bt_facts", ["k"], 4, sort_columns=["k"])
    write_bucketed(dims, "bt_dims", ["k"], 4, sort_columns=["k"])
    yield "bt_facts", "bt_dims"
    spark.sql("DROP TABLE IF EXISTS bt_facts")
    spark.sql("DROP TABLE IF EXISTS bt_dims")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    assert bucketed_join_ready(spark, lt, rt)
    # disable broadcast so the join strategy is SMJ over the buckets
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(lt).join(spark.table(rt), "k")
        a = audit(joined)
        assert a.joins.get("SortMergeJoin", 0) == 1
        assert a.exchanges == 0  # co-located: no shuffle on either side
        assert joined.count() == 1_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_unbucketed_join_shuffles_for_contrast(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 10_000, 1, 8).selectExpr("id as k", "id * 2 as v1")
        b = spark.range(0, 1_000, 1, 4).selectExpr("id as k", "id * 3 as v2")
        plan = audit(a.join(b, "k"))
        assert plan.exchanges >= 2  # both sides shuffle without bucketing
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_pipeline_bucketed_target(spark):
    """bucket_by/num_buckets flow through the parquet writer's options."""
    from lakehouse_ingestion_spark.sinks.base import WriteOptions, get_writer

    df = spark.range(0, 100, 1, 4).selectExpr("id as k", "id * 2 as v")
    opts = WriteOptions(
        table="bt_cfg", mode="overwrite",
        options={"bucket_by": "k", "num_buckets": 4, "sort_by": "k"},
    )
    try:
        get_writer("parquet").write_batch(df, opts)
        assert spark.table("bt_cfg").count() == 100
        ddl = spark.sql("SHOW CREATE TABLE bt_cfg").collect()[0][0]
        assert "CLUSTERED BY" in ddl and "4 BUCKETS" in ddl
    finally:
        spark.sql("DROP TABLE IF EXISTS bt_cfg")


def test_bucketed_requires_table(spark):
    from lakehouse_ingestion_spark.sinks.base import WriteOptions, get_writer

    df = spark.range(3).selectExpr("id as k")
    with pytest.raises(ValueError, match="catalog"):
        get_writer("parquet").write_batch(
            df,
            WriteOptions(path="/tmp/x", mode="overwrite", options={"bucket_by": "k"}),
        )
