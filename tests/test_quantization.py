"""Tests for operators/quantization.py and streaming/dedup.py."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.quantization import (
    dequantize,
    quantize_embeddings,
    quantize_minmax,
)


def test_quantize_roundtrip_error_bound(spark):
    rng = np.random.default_rng(3)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    for i, v in rows:
        r = out[i]
        v = np.asarray(v)
        assert r["qmin"] == pytest.approx(v.min())
        assert r["scale"] == pytest.approx((v.max() - v.min()) / 255.0)
        codes = np.asarray(r["codes"])
        assert codes.min() >= 0 and codes.max() <= 255
        # reconstruction error bounded by (scale/2)^2 per dimension
        deq = r["qmin"] + codes * r["scale"]
        assert np.abs(deq - v).max() <= r["scale"] / 2 + 1e-12
        assert r["recon_mse"] == pytest.approx(float(((deq - v) ** 2).mean()))


def test_quantize_vectorized_matches_column_form(spark):
    """The numpy path and the pure-Column path must produce identical
    codes, scales, and summaries (floor(+0.5) is the same double op)."""
    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(size=8).tolist()) for i in range(30)]
    rows.append((99, [1.5] * 8))  # constant vector in the same batch
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cols = ["vec_id", "codes", "qmin", "scale", "codes_sum", "code_max"]
    fast = {
        r["vec_id"]: [r[c] for c in cols[1:]]
        for r in quantize_embeddings(df, vectorized=True).collect()
    }
    slow = {
        r["vec_id"]: [r[c] for c in cols[1:]]
        for r in quantize_embeddings(df, vectorized=False).collect()
    }
    assert fast == slow


def test_quantize_constant_vector(spark):
    df = spark.createDataFrame(
        [(1, [2.5, 2.5, 2.5])], "vec_id long, embedding array<double>"
    )
    r = quantize_embeddings(df).collect()[0]
    assert r["codes"] == [0, 0, 0]
    assert r["scale"] == 0.0
    assert r["recon_mse"] == 0.0  # dequant returns the constant exactly


def test_dequantize_column_form(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0, 2.0])], "vec_id long, v array<double>"
    )
    codes, qmin, scale = quantize_minmax(F.col("v"), levels=4)
    out = df.select(
        dequantize(codes, qmin, scale).alias("deq")
    ).collect()[0]["deq"]
    assert out == pytest.approx([0.0, 1.0, 2.0])


def test_streaming_dedup_within_watermark(spark, tmp_path):
    from lakehouse_ingestion_spark.streaming.dedup import (
        streaming_dedup,
        streaming_dedup_within_watermark,
    )
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    rows1 = [
        {"event_id": 1, "ts": "2026-01-01T10:00:00", "v": "a"},
        {"event_id": 2, "ts": "2026-01-01T10:00:10", "v": "b"},
    ]
    # batch 2 redelivers event 1 within the watermark
    rows2 = [
        {"event_id": 1, "ts": "2026-01-01T10:00:00", "v": "a"},
        {"event_id": 3, "ts": "2026-01-01T10:00:20", "v": "c"},
    ]
    (indir / "b1.jsonl").write_text("\n".join(json.dumps(r) for r in rows1))
    (indir / "b2.jsonl").write_text("\n".join(json.dumps(r) for r in rows2))

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("v", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .json(str(indir))
    )
    deduped = streaming_dedup_within_watermark(
        stream, ["event_id"], "ts", "10 minutes"
    )
    out = str(tmp_path / "out")
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    )
    assert got == [1, 2, 3]  # the redelivered event 1 was dropped

    with pytest.raises(ConfigError, match="at least one"):
        streaming_dedup(stream, [])
    with pytest.raises(ConfigError, match="watermarking"):
        streaming_dedup_within_watermark(stream, ["ts"], "ts")


def test_quantize_ragged_widths_and_id_type(spark):
    """The Arrow path handles ragged vector widths (reduceat segments,
    not a rectangular stack) and preserves a non-long id type instead of
    hardcoding `long` in the output schema."""
    rng = np.random.default_rng(11)
    rows = [
        (i, rng.normal(size=w).tolist())
        for i, w in enumerate([3, 8, 1, 5, 8, 2])
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = quantize_embeddings(df, vectorized=True)
    assert dict(out.dtypes)["vec_id"] == "int"
    got = {r["vec_id"]: r for r in out.collect()}
    slow = {
        r["vec_id"]: r
        for r in quantize_embeddings(
            df.selectExpr("cast(vec_id as long) vec_id", "embedding"),
            vectorized=False,
        ).collect()
    }
    for i, (_, vec) in enumerate(rows):
        assert len(got[i]["codes"]) == len(vec)
        assert got[i]["codes"] == slow[i]["codes"]
        assert got[i]["codes_sum"] == slow[i]["codes_sum"]


def test_quantize_rejects_empty_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(Exception, match="empty"):
        quantize_embeddings(df, vectorized=True).collect()


def test_random_projection_jl_property(spark):
    """Determinism, shape, numpy equivalence, and the JL distance
    bound the operator exists for."""
    import numpy as np
    import pytest

    from lakehouse_ingestion_spark.operators.projection import (
        project_embeddings,
        projection_matrix,
    )

    rng = np.random.default_rng(7)
    n, d, k = 200, 64, 24
    X = rng.standard_normal((n, d))
    df = spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(4)

    out = project_embeddings(df, out_dim=k, seed=42)
    rows = {r["vec_id"]: np.array(r["proj"]) for r in out.collect()}
    assert len(rows) == n and rows[0].shape == (k,)

    # bit-exact vs the driver-side reference matmul
    R = projection_matrix(d, k, seed=42)
    for i in (0, 17, 199):
        assert np.allclose(rows[i], X[i] @ R.T, rtol=0, atol=1e-12)

    # determinism across invocations
    again = {r["vec_id"]: np.array(r["proj"])
             for r in project_embeddings(df, out_dim=k, seed=42).collect()}
    assert all(np.array_equal(rows[i], again[i]) for i in rows)

    # JL: pairwise squared distances preserved within a loose band
    # (statistical, seed-pinned; k=24 gives epsilon ~0.6-0.9 tails over
    # 60 sampled pairs)
    P = np.stack([rows[i] for i in range(n)])
    idx = rng.integers(0, n, size=(60, 2))
    for a, b in idx:
        if a == b:
            continue
        d2 = ((X[a] - X[b]) ** 2).sum()
        p2 = ((P[a] - P[b]) ** 2).sum()
        assert 0.2 * d2 < p2 < 2.2 * d2

    # ragged vectors raise
    bad = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [1.0] * 63)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="64-wide"):
        project_embeddings(bad, out_dim=8).collect()

    # a null ELEMENT inside a vector raises too (outer null_count is 0;
    # flatten() would otherwise turn it into a silent NaN projection)
    inner_null = spark.createDataFrame(
        [(0, [1.0] * 64), (1, [1.0] * 32 + [None] + [1.0] * 31)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="null elements"):
        project_embeddings(inner_null, out_dim=8).collect()
