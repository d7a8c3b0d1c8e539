"""semantic_decontaminate: flags, tie-breaks, gates."""

import pytest

from lakehouse_ingestion_spark.errors import ConfigError
from lakehouse_ingestion_spark.operators.semantic_decon import (
    semantic_decontaminate,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_flags_and_cosines(spark):
    ev = _emb(spark, [(100, [1.0, 0.0])])
    tr = _emb(
        spark,
        [(1, [2.0, 0.0]), (2, [0.0, 3.0]), (3, [-1.0, 0.0]), (4, [1.0, 1.0])],
    )
    got = {
        r["vec_id"]: (r["max_cos"], r["nearest_eval_id"], r["contaminated"])
        for r in semantic_decontaminate(tr, ev, threshold=0.9).collect()
    }
    assert got[1] == (1.0, 100, True)  # parallel, magnitude-invariant
    assert got[2] == (0.0, 100, False)  # orthogonal
    assert got[3] == (-1.0, 100, False)  # opposite
    assert got[4] == (round(0.5**0.5, 6), 100, False)  # 45 degrees


def test_nearest_tie_breaks_to_smallest_eval_id(spark):
    ev = _emb(spark, [(7, [1.0, 0.0]), (5, [1.0, 0.0])])
    tr = _emb(spark, [(1, [1.0, 0.0])])
    row = semantic_decontaminate(tr, ev).collect()[0]
    assert row["nearest_eval_id"] == 5


def test_max_over_evals(spark):
    ev = _emb(spark, [(10, [1.0, 0.0]), (20, [0.0, 1.0])])
    tr = _emb(spark, [(1, [1.0, 10.0])])
    row = semantic_decontaminate(tr, ev, threshold=0.95).collect()[0]
    assert row["nearest_eval_id"] == 20 and row["contaminated"] is True


def test_empty_eval_set(spark):
    ev = _emb(spark, []).filter("vec_id IS NOT NULL")
    tr = _emb(spark, [(1, [1.0, 0.0])])
    row = semantic_decontaminate(tr, ev).collect()[0]
    assert row["max_cos"] is None
    assert row["nearest_eval_id"] is None
    assert row["contaminated"] is False


def test_max_eval_gate(spark):
    ev = _emb(spark, [(i, [1.0, 0.0]) for i in range(5)])
    tr = _emb(spark, [(1, [1.0, 0.0])])
    with pytest.raises(ConfigError, match="max_eval"):
        semantic_decontaminate(tr, ev, max_eval=3)


def test_threshold_validation(spark):
    ev = _emb(spark, [(1, [1.0, 0.0])])
    with pytest.raises(ConfigError, match="threshold"):
        semantic_decontaminate(ev, ev, threshold=0.0)


def test_map_only_plan(spark):
    """The 100-TB contract: no exchange anywhere — scan + Arrow eval."""
    ev = _emb(spark, [(100, [1.0, 0.0])])
    tr = _emb(spark, [(1, [2.0, 0.0]), (2, [0.0, 3.0])])
    out = semantic_decontaminate(tr, ev)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_streaming_transform(spark, tmp_path):
    """The screen composes into Structured Streaming untouched: the eval
    matrix is batch-side (collected once at plan build), the corpus pass
    is MapInPandas — legal in a streaming plan, no state required."""
    import json

    indir = tmp_path / "stream_in"
    indir.mkdir()
    (indir / "b0.jsonl").write_text(
        "\n".join(
            json.dumps({"vec_id": i, "embedding": v})
            for i, v in [(1, [0.99, 0.01]), (2, [0.0, 1.0])]
        )
    )
    ev = _emb(spark, [(100, [1.0, 0.0])])
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .json(str(indir))
    )
    out = semantic_decontaminate(stream, ev, threshold=0.9)
    assert out.isStreaming
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["vec_id"]: r["contaminated"]
        for r in spark.read.parquet(str(tmp_path / "out")).collect()
    }
    assert rows == {1: True, 2: False}
