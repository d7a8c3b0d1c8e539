"""Sink tests: parquet round-trip + gated Delta/Iceberg behavior."""

from __future__ import annotations

import pytest

from lakehouse_ingestion_spark.errors import UnsupportedFeatureError
from lakehouse_ingestion_spark.sinks.base import WriteOptions, get_writer


def test_writer_registry():
    assert get_writer("parquet") is not None
    assert get_writer("s3-parquet") is not None  # reference alias
    assert get_writer("delta") is not None
    assert get_writer("deltalake") is not None  # reference alias
    assert get_writer("iceberg") is not None
    with pytest.raises(UnsupportedFeatureError):
        get_writer("no-such-format")


def test_parquet_partitioned_roundtrip(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", "2024-01-01"), (2, "b", "2024-01-02")], "id int, v string, d string"
    )
    opts = WriteOptions(
        path=str(tmp_path / "t"), mode="overwrite", partition_by=["d"]
    )
    get_writer("parquet").write_batch(df, opts)
    back = spark.read.parquet(str(tmp_path / "t"))
    assert back.count() == 2
    assert any(p.name.startswith("d=") for p in (tmp_path / "t").iterdir() if p.is_dir())


def test_delta_gated(spark, tmp_path):
    from lakehouse_ingestion_spark.sinks.delta import DeltaTable

    if DeltaTable is not None:
        pytest.skip("delta-spark present; gate not exercised")
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(UnsupportedFeatureError, match="delta"):
        get_writer("delta").write_batch(df, WriteOptions(path=str(tmp_path / "d")))


def test_iceberg_gated(spark, tmp_path):
    from lakehouse_ingestion_spark.sinks.iceberg import iceberg_available

    if iceberg_available(spark):
        pytest.skip("iceberg runtime present; gate not exercised")
    df = spark.createDataFrame([(1,)], "id int")
    with pytest.raises(UnsupportedFeatureError, match="iceberg"):
        get_writer("iceberg").write_batch(df, WriteOptions(table="ns.t"))
