"""shard_assign / export_shards: deterministic shuffle, balanced shards,
order-preserving shard files."""

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.export import (
    export_shards,
    shard_assign,
    shuffle_position,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 501)], "doc_id long, text string"
    )


def test_shard_assign_shape(spark, docs):
    out = shard_assign(docs, "doc_id", 8).collect()
    assert len(out) == 500
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        by_shard.setdefault(r["shard"], []).append(r)
    # every shard used (md5 uniformity at n=500, k=8 — deterministic)
    assert len(by_shard) == 8
    for rows in by_shard.values():
        assert sorted(r["pos"] for r in rows) == list(range(1, len(rows) + 1))


def test_deterministic_and_seed_sensitive(spark, docs):
    a = sorted(tuple(r) for r in shard_assign(docs, "doc_id", 8).collect())
    b = sorted(tuple(r) for r in shard_assign(docs, "doc_id", 8).collect())
    assert a == b
    c = sorted(tuple(r) for r in shard_assign(docs, "doc_id", 8, seed="other").collect())
    assert a != c


def test_null_key_raises(spark):
    df = spark.createDataFrame([(None, "x")], "doc_id long, text string")
    with pytest.raises(Exception, match="must not be NULL"):
        shard_assign(df, "doc_id", 4).collect()


def test_bad_shard_count(spark, docs):
    with pytest.raises(ConfigError):
        shard_assign(docs, "doc_id", 0)


def test_export_layout_and_order(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    export_shards(docs, path, "doc_id", n_shards=4, seed="export")
    dirs = sorted(glob.glob(os.path.join(path, "shard=*")))
    assert [os.path.basename(d) for d in dirs] == [f"shard={k}" for k in range(4)]

    expected = shard_assign(docs, "doc_id", 4, seed="export")
    for k in range(4):
        files = sorted(glob.glob(os.path.join(path, f"shard={k}", "*.parquet")))
        assert len(files) == 1  # one task holds each shard value
        got_ids = []
        for f in files:
            got_ids.extend(pq.read_table(f).column("doc_id").to_pylist())
        want = [
            r["doc_id"]
            for r in expected.filter(F.col("shard") == k)
            .orderBy("pos")
            .collect()
        ]
        # file row order IS the deterministic shuffle order
        assert got_ids == want


def test_export_max_records_per_file(spark, docs, tmp_path):
    path = str(tmp_path / "small_files")
    export_shards(
        docs, path, "doc_id", n_shards=2, seed="export", max_records_per_file=50
    )
    files = sorted(glob.glob(os.path.join(path, "shard=0", "*.parquet")))
    assert len(files) > 1  # split, and lexicographic order keeps the stream order
    got = []
    for f in files:
        got.extend(pq.read_table(f).column("doc_id").to_pylist())
    want = [
        r["doc_id"]
        for r in shard_assign(docs, "doc_id", 2, seed="export")
        .filter(F.col("shard") == 0)
        .orderBy("pos")
        .collect()
    ]
    assert got == want


def test_shuffle_position_is_pure(spark, docs):
    two = docs.select(
        shuffle_position("doc_id").alias("a"), shuffle_position("doc_id").alias("b")
    )
    assert two.filter(F.col("a") != F.col("b")).count() == 0
