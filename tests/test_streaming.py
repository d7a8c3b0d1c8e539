import json
import time

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from lakehouse_ingestion_spark.dq.checks import RangeCheck
from lakehouse_ingestion_spark.dq.ruleset import DQRuleSet, OnFailPolicy
from lakehouse_ingestion_spark.sources.files import FileReader
from lakehouse_ingestion_spark.streaming.foreach_batch import dq_foreach_batch
from lakehouse_ingestion_spark.streaming.manager import StreamManager

SCHEMA = StructType(
    [
        StructField("id", LongType(), True),
        StructField("v", DoubleType(), True),
        StructField("tag", StringType(), True),
    ]
)


def _write_batch(path, rows, name):
    (path / name).write_text("\n".join(json.dumps(r) for r in rows))


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    _write_batch(d, [{"id": 1, "v": 5.0, "tag": "a"}, {"id": 2, "v": -3.0, "tag": "b"}], "b1.jsonl")
    return d


def test_streaming_file_source_with_dq(spark, stream_dir, tmp_path):
    out = str(tmp_path / "out")
    quarantine = str(tmp_path / "q")
    cp = str(tmp_path / "cp")

    reader = FileReader()
    df = reader.read(
        spark,
        {"path": str(stream_dir), "format": "json", "streaming": "true",
         "maxFilesPerTrigger": "1"},
        SCHEMA,
    )
    assert df.isStreaming

    rs = DQRuleSet([RangeCheck(column="v", min_value=0.0)])
    fn = dq_foreach_batch(
        rs,
        OnFailPolicy.QUARANTINE,
        sink=lambda b, e: b.write.mode("append").parquet(out),
        quarantine_sink=lambda b, e: b.write.mode("append").parquet(quarantine),
    )
    mgr = StreamManager(spark)
    q = mgr.register(
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert not q.isActive or q.awaitTermination(30)

    good = spark.read.parquet(out)
    assert good.count() == 1
    assert good.collect()[0].id == 1
    bad = spark.read.parquet(quarantine)
    assert bad.count() == 1
    assert bad.collect()[0].id == 2

    # second micro-batch appends incrementally (checkpoint resume)
    _write_batch(stream_dir, [{"id": 3, "v": 7.0, "tag": "c"}], "b2.jsonl")
    q2 = mgr.register(
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == 2  # id=1 and id=3, no re-processing


def test_stream_manager_nonblocking(spark, stream_dir, tmp_path):
    """Two streams can be launched before either is awaited (the reference
    serializes on awaitTermination inside the writer)."""
    reader = FileReader()
    df = reader.read(
        spark,
        {"path": str(stream_dir), "format": "json", "streaming": "true"},
        SCHEMA,
    )
    mgr = StreamManager(spark)
    qs = []
    for i in range(2):
        qs.append(
            mgr.register(
                df.writeStream.format("noop")
                .option("checkpointLocation", str(tmp_path / f"cp{i}"))
                .trigger(availableNow=True)
                .start()
            )
        )
    assert len(mgr.queries) == 2
    for q in qs:
        q.awaitTermination(120)
    assert mgr.active == []
