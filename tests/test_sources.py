import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_ingestion_spark.errors import ConfigError, UnsupportedFeatureError
from lakehouse_ingestion_spark.sources import FileReader, get_reader
from lakehouse_ingestion_spark.sources.kafka import decode_json_value

PAYLOAD_SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("name", StringType(), True),
        StructField("amount", DoubleType(), True),
    ]
)


def test_reader_registry():
    assert isinstance(get_reader("csv"), FileReader)
    assert isinstance(get_reader("PARQUET"), FileReader)
    with pytest.raises(UnsupportedFeatureError):
        get_reader("no-such-source")


def test_csv_reader_with_schema(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("id,name,amount\n1,alpha,10.5\n2,beta,20.0\n")
    df = FileReader().read(
        spark, {"path": str(p), "format": "csv", "header": "true"}, PAYLOAD_SCHEMA
    )
    assert df.schema == PAYLOAD_SCHEMA
    assert df.count() == 2


def test_file_reader_requires_path(spark):
    with pytest.raises(ConfigError):
        FileReader().read(spark, {"format": "csv"})


def test_streaming_requires_schema(spark, tmp_path):
    with pytest.raises(ConfigError):
        FileReader().read(
            spark, {"path": str(tmp_path), "format": "json", "streaming": "true"}
        )


def test_kafka_decode_chain(spark):
    """The CAST->from_json->flatten chain (reference KafkaReader.scala:45-53)
    exercised against a file-backed frame with the Kafka wire shape."""
    rows = [
        (b"k1", json.dumps({"id": 1, "name": "a", "amount": 1.5}).encode(), "t", 0, 100, "2024-01-01 00:00:00"),
        (b"k2", json.dumps({"id": 2, "name": "b", "amount": 2.5}).encode(), "t", 1, 200, "2024-01-01 00:00:01"),
        (b"k3", b"not json at all", "t", 1, 201, "2024-01-01 00:00:02"),
    ]
    raw = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long, timestamp string"
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))

    out = decode_json_value(raw, PAYLOAD_SCHEMA)
    assert out.columns == ["id", "name", "amount"]
    got = {r.id: (r.name, r.amount) for r in out.collect()}
    assert got[1] == ("a", 1.5)
    assert got[2] == ("b", 2.5)
    # malformed JSON -> null row (PERMISSIVE), not a crash
    assert None in got

    meta = decode_json_value(raw, PAYLOAD_SCHEMA, keep_kafka_meta=True)
    assert set(["topic", "partition", "offset", "timestamp"]) <= set(meta.columns)


def test_kafka_reader_validates_options(spark):
    from lakehouse_ingestion_spark.sources.kafka import KafkaReader

    with pytest.raises(ConfigError):
        KafkaReader().read(spark, {"subscribe": "t"})
    with pytest.raises(ConfigError):
        KafkaReader().read(spark, {"kafka.bootstrap.servers": "x:9092"})


def test_jdbc_reader_validates_options(spark):
    from lakehouse_ingestion_spark.sources.jdbc import JdbcReader

    with pytest.raises(ConfigError):
        JdbcReader().read(spark, {})
    with pytest.raises(ConfigError):
        JdbcReader().read(spark, {"url": "jdbc:postgresql://x/db"})


def test_avro_gated_when_package_missing(spark, tmp_path):
    from lakehouse_ingestion_spark.errors import UnsupportedFeatureError
    from lakehouse_ingestion_spark.sources.files import FileReader, _avro_available

    if _avro_available(spark):
        import pytest

        pytest.skip("spark-avro present; gate not exercised")
    import pytest

    with pytest.raises(UnsupportedFeatureError, match="spark-avro"):
        FileReader().read(spark, {"path": str(tmp_path), "format": "avro"})


def test_kinesis_gated_and_validated(spark):
    import pytest

    from lakehouse_ingestion_spark.errors import ConfigError, UnsupportedFeatureError
    from lakehouse_ingestion_spark.sources.base import get_reader

    reader = get_reader("kinesis")
    with pytest.raises(ConfigError, match="streamName"):
        reader.read(spark, {})
    with pytest.raises(UnsupportedFeatureError, match="connector"):
        reader.read(spark, {"streamName": "s", "region": "us-east-1"})


def test_binaryfile_reader_batch_and_streaming(spark, tmp_path):
    """binaryFile is the raw-media ingest entry (multimodal pipeline):
    fixed schema, content as bytes; streaming works schema-less (the
    one file format where that is correct)."""
    blob = tmp_path / "img.bin"
    payload = bytes(range(64))
    blob.write_bytes(payload)

    df = FileReader().read(
        spark, {"path": str(tmp_path), "format": "binaryFile"}
    )
    rows = df.collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == payload
    assert rows[0]["length"] == 64
    assert set(df.columns) == {"path", "modificationTime", "length", "content"}

    sdf = FileReader().read(
        spark,
        {"path": str(tmp_path), "format": "binaryfile", "streaming": "true"},
    )
    assert sdf.isStreaming
    assert set(sdf.columns) == {"path", "modificationTime", "length", "content"}


def test_binaryfile_rejects_user_schema(spark, tmp_path):
    with pytest.raises(ConfigError, match="fixed schema"):
        FileReader().read(
            spark,
            {"path": str(tmp_path), "format": "binaryFile"},
            PAYLOAD_SCHEMA,
        )
