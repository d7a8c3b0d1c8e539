import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_ingestion_spark.errors import SchemaValidationError
from lakehouse_ingestion_spark.schema_validator import (
    conform,
    validate,
    validate_nullability,
    validate_or_throw,
)

EXPECTED = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
    ]
)


def test_valid(spark):
    df = spark.createDataFrame([(1, "a", 1.0)], schema="id long, name string, score double")
    res = validate(df, EXPECTED)
    assert res.is_valid
    # nullability drift is only a warning
    assert any("nullable" in w for w in res.warnings)


def test_missing_column(spark):
    # missing NULLABLE column = additive-evolution artifact -> warning only
    df = spark.createDataFrame([(1, "a")], schema="id long, name string")
    res = validate(df, EXPECTED)
    assert res.is_valid
    assert any("missing nullable column: score" in w for w in res.warnings)

    # missing NOT NULL column stays a hard error
    df2 = spark.createDataFrame([("a", 1.0)], schema="name string, score double")
    res2 = validate(df2, EXPECTED)
    assert not res2.is_valid
    assert any("missing column: id" in e for e in res2.errors)
    with pytest.raises(SchemaValidationError):
        validate_or_throw(df2, EXPECTED)


def test_type_mismatch(spark):
    df = spark.createDataFrame(
        [(1, "a", "oops")], schema="id long, name string, score string"
    )
    res = validate(df, EXPECTED)
    assert not res.is_valid
    assert any("type mismatch for score" in e for e in res.errors)


def test_extra_column_warns(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0, "x")], schema="id long, name string, score double, extra string"
    )
    res = validate(df, EXPECTED)
    assert res.is_valid
    assert any("extra column" in w for w in res.warnings)


def test_nullability_scan_single_pass(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (None, "b", 2.0), (None, "c", None)],
        schema="id long, name string, score double",
    )
    counts = validate_nullability(df, EXPECTED)
    assert counts == {"id": 2}


def test_conform_casts_and_orders(spark):
    df = spark.createDataFrame(
        [("1", 2.0, "x", "extra")], schema="id string, score double, name string, junk string"
    )
    out = conform(df, EXPECTED)
    assert [f.name for f in out.schema.fields] == ["id", "name", "score"]
    assert dict(out.dtypes)["id"] == "bigint"
    row = out.collect()[0]
    assert row.id == 1 and row.name == "x"
