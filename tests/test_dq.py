import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType, DoubleType

from lakehouse_ingestion_spark.dq import (
    DQRuleSet,
    DQStatus,
    FreshnessCheck,
    NotNullCheck,
    OnFailPolicy,
    RangeCheck,
    ReferentialIntegrityCheck,
    RegexCheck,
    RowCountCheck,
    SetMembershipCheck,
    UniqueKeyCheck,
    checks_from_schema,
)
from lakehouse_ingestion_spark.errors import DataQualityError


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [
            ("a", 10.0, "USD", "k1"),
            ("b", -5.0, "USD", "k2"),   # range violation
            (None, 20.0, "EUR", "k3"),  # null violation
            ("d", 30.0, "XXX", "k4"),   # set violation
            ("e", 40.0, "GBP", "k4"),   # duplicate key
        ],
        schema="name string, amount double, currency string, key string",
    )


def test_not_null(df):
    r = NotNullCheck(column="name").run(df)
    assert r.status is DQStatus.FAIL
    assert r.metrics["violations"] == 1
    r2 = NotNullCheck(column="name", failure_threshold=0.5).run(df)
    assert r2.status is DQStatus.WARNING


def test_range(df):
    r = RangeCheck(column="amount", min_value=0.0, max_value=100.0).run(df)
    assert r.status is DQStatus.FAIL
    assert r.metrics["violations"] == 1


def test_range_requires_bound():
    with pytest.raises(ValueError):
        RangeCheck(column="x")


def test_regex(df):
    r = RegexCheck(column="currency", pattern="^[A-Z]{3}$").run(df)
    assert r.status is DQStatus.PASS


def test_set_membership(df):
    r = SetMembershipCheck(column="currency", allowed_values=["USD", "EUR", "GBP"]).run(df)
    assert r.status is DQStatus.FAIL
    assert r.metrics["violations"] == 1


def test_unique_key(df):
    r = UniqueKeyCheck(key_columns=["key"]).run(df)
    assert r.status is DQStatus.FAIL
    assert r.metrics["duplicates"] == 1


def test_row_count(df):
    assert RowCountCheck(min_rows=1, max_rows=10).run(df).status is DQStatus.PASS
    assert RowCountCheck(min_rows=100).run(df).status is DQStatus.FAIL


def test_freshness(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2030-01-01 00:00:00",)], schema="ts string"
    ).select(F.col("ts").cast("timestamp").alias("ts"))
    r = FreshnessCheck(
        column="ts", now=F.lit("2025-01-01 00:00:00").cast("timestamp")
    ).run(df)
    assert r.status is DQStatus.FAIL
    assert r.metrics["violations"] == 1


def test_referential_integrity(spark, df):
    parent = spark.createDataFrame([("USD",), ("EUR",)], schema="code string")
    r = ReferentialIntegrityCheck(
        fk_columns=["currency"], parent_df=parent, parent_key_columns=["code"]
    ).run(df)
    assert r.status is DQStatus.FAIL
    assert r.metrics["orphans"] == 2  # XXX and GBP


def test_fused_ruleset_single_pass(df):
    rs = DQRuleSet(
        [
            NotNullCheck(column="name"),
            RangeCheck(column="amount", min_value=0.0),
            UniqueKeyCheck(key_columns=["key"]),
            RowCountCheck(min_rows=1),
        ]
    )
    summary = rs.apply(df)
    assert summary.status is DQStatus.FAIL
    assert len(summary.results) == 4
    assert len(summary.failed) == 3


def test_missing_column_fails_gracefully(df):
    rs = DQRuleSet([NotNullCheck(column="nope")])
    s = rs.apply(df)
    assert s.status is DQStatus.FAIL
    assert "missing columns" in s.results[0].message


def test_policy_fail_fast(df):
    rs = DQRuleSet([NotNullCheck(column="name")])
    with pytest.raises(DataQualityError):
        rs.enforce(df, OnFailPolicy.FAIL_FAST)


def test_policy_log_only(df):
    rs = DQRuleSet([NotNullCheck(column="name")])
    out, summary = rs.enforce(df, OnFailPolicy.LOG_ONLY)
    assert out.count() == 5
    assert summary.status is DQStatus.FAIL


def test_policy_quarantine_split(df):
    rs = DQRuleSet(
        [
            NotNullCheck(column="name"),
            RangeCheck(column="amount", min_value=0.0),
        ]
    )
    captured = {}
    out, summary = rs.enforce(
        df, OnFailPolicy.QUARANTINE, quarantine_writer=lambda bad: captured.update(n=bad.count())
    )
    assert out.count() == 3
    assert captured["n"] == 2
    good, bad = rs.split(df)
    tags = {r.name: r._dq_failures for r in bad.collect()}
    assert tags[None] == ["not_null[name]"]
    assert tags["b"] == ["range[amount]"]


def test_checks_from_schema_metadata():
    schema = StructType(
        [
            StructField("amount", DoubleType(), False,
                        metadata={"min_value": 0.0, "max_value": 10.0}),
            StructField("currency", StringType(), True,
                        metadata={"allowed_values": ["USD"]}),
            StructField("id", StringType(), True, metadata={"unique": True}),
            StructField("_ingestion_time", StringType(), False,
                        metadata={"system_column": True}),
        ]
    )
    checks = checks_from_schema(schema, primary_key=["id", "currency"])
    kinds = sorted(type(c).__name__ for c in checks)
    assert kinds == [
        "NotNullCheck",
        "RangeCheck",
        "SetMembershipCheck",
        "UniqueKeyCheck",
        "UniqueKeyCheck",
    ]
