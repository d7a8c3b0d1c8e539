import pytest
from pyspark.sql import functions as F

from lakehouse_ingestion_spark.functions.multimodal import (
    FEATURE_DIM,
    extract_media_features,
    sample_frames,
)


@pytest.fixture()
def media(spark):
    return spark.createDataFrame(
        [(1, b"hello world, this is binary content for media one"),
         (2, b"x" * 5000),
         (3, b"")],
        "media_id long, content binary",
    )


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_media_features(media, "content", "media_id")
    rows = {r.media_id: r for r in out.collect()}
    assert rows[1].n_bytes == 49
    assert len(rows[1].embedding) == FEATURE_DIM
    assert rows[1].decoder == "stub-md5"
    # deterministic: same bytes -> same embedding
    again = {r.media_id: r for r in extract_media_features(media, "content", "media_id").collect()}
    assert again[1].embedding == rows[1].embedding
    # byte stats
    assert rows[2].byte_mean == float(ord("x"))
    assert rows[2].byte_std == 0.0


def test_empty_blob_error_routing(spark, media):
    out = {r.media_id: r for r in extract_media_features(media).collect()}
    assert out[3].decoder == "error"
    assert out[3].embedding is None
    with pytest.raises(Exception):
        extract_media_features(media, on_error="fail").collect()


def test_sample_frames(spark, media):
    out = {r.media_id: r for r in
           sample_frames(media, every_n_bytes=1000, max_frames=3).collect()}
    assert out[2].n_frames == 3  # 5000 bytes capped at 3 frames
    assert len(out[2].frames) == 3
    assert len(out[2].frames[0]) == 1000
    assert out[3].n_frames == 0
    assert out[3].frames == []
    assert out[1].n_frames == 1


def test_resize_media(spark):
    from lakehouse_ingestion_spark.functions.multimodal import resize_media

    df = spark.createDataFrame(
        [(1, bytes(range(256))), (2, b"\x00" * 10), (3, b"")],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r for r in resize_media(df, target_width=8, target_height=4).collect()}
    assert len(out[1]["content"]) == 32  # exactly w*h bytes
    assert (out[1]["width"], out[1]["height"]) == (8, 4)
    assert out[1]["resizer"] == "stub-interp"
    # monotone input stays monotone under index interpolation
    vals = list(out[1]["content"])
    assert vals == sorted(vals)
    assert out[2]["content"] == b"\x00" * 32
    assert out[3]["content"] is None and out[3]["resizer"] == "error"
